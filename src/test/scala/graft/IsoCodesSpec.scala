package graft

import graft.checks.IsoCodes
import org.scalatest.funsuite.AnyFunSuite

/** Bundled ISO registry sanity (full public-standard lists). */
class IsoCodesSpec extends AnyFunSuite {

  test("ISO 3166-2 registry covers 200 countries with ~5k codes") {
    assert(IsoCodes.subdivisions.size == 200)
    assert(IsoCodes.subdivisions.values.map(_.size).sum > 5000)
    // spot checks across continents
    assert(IsoCodes.subdivisions("US").contains("US-CA"))
    assert(IsoCodes.subdivisions("FR").contains("FR-13"))
    assert(IsoCodes.subdivisions("JP").contains("JP-13"))
    assert(IsoCodes.subdivisions("GB").contains("GB-BIR"))
    assert(IsoCodes.subdivisions("BR").contains("BR-SP"))
    assert(IsoCodes.subdivisions("IN").contains("IN-MH"))
    assert(!IsoCodes.subdivisions("FR").contains("FR-99"))
  }

  test("ISO 3166-1 numeric codes load and contain known entries") {
    assert(IsoCodes.countryNumeric.size == 249)
    assert(IsoCodes.countryNumeric.contains("840")) // US
    assert(IsoCodes.countryNumeric.contains("392")) // JP
    assert(!IsoCodes.countryNumeric.contains("999"))
    assert(IsoCodes.countryNumeric.forall(_.matches("\\d{3}")))
  }

  test("national-id registry: new country patterns accept/reject shapes") {
    def ok(country: String, v: String): Boolean =
      v.matches(graft.checks.RowChecks.NationalIdPatterns(country))
    assert(ok("us", "123-45-6789") && ok("us", "123 45 6789") && ok("us", "123456789"))
    assert(!ok("us", "123-45 6789") && !ok("us", "000-12-3456")) // mixed separators / invalid area
    assert(ok("es", "12345678Z") && ok("es", "X1234567L") && !ok("es", "1234567A"))
    assert(ok("pl", "44051401359") && !ok("pl", "4405140135"))
    assert(ok("br", "123.456.789-09") && ok("br", "12345678909") && !ok("br", "123.456.789"))
    assert(ok("se", "811218-9876") && ok("se", "198112189876"))
    assert(ok("jp", "1234 5678 9012") && ok("jp", "123456789012"))
    assert(ok("it", "RSSMRA85T10A562S") && !ok("it", "RSSMRA85X10A562S"))
    assert(ok("nl", "123456782") && !ok("nl", "12345678"))
    assert(ok("mx", "GOMC900514HDFMRL09") && !ok("mx", "GOMC900514XDFMRL09"))
  }
}
