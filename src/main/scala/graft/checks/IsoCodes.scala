package graft.checks

/** ISO code registries used by validity checks (reference loads these from
  * packaged resource files, dqx/check_funcs.py:1167 + text files under dqx/resources/).
  * Public-standard data (ISO 3166-1, ISO 3166-2 subset, ISO 4217 alphabetic +
  * numeric, ISO 639-1 + 639-3). The bundled text registries
  * (iso_3166_1_numeric, iso_3166_2, iso_4217_numeric, iso_639_3_alpha_3)
  * are verbatim PUBLIC STANDARD DATA — code lists published by ISO, not
  * code — mirrored so both engines validate against identical registries.
  */
object IsoCodes {

  val countryAlpha2: Seq[String] = (
    "AD AE AF AG AI AL AM AO AQ AR AS AT AU AW AX AZ BA BB BD BE BF BG BH BI BJ BL BM BN BO BQ BR BS BT BV BW BY BZ " +
    "CA CC CD CF CG CH CI CK CL CM CN CO CR CU CV CW CX CY CZ DE DJ DK DM DO DZ EC EE EG EH ER ES ET FI FJ FK FM FO FR " +
    "GA GB GD GE GF GG GH GI GL GM GN GP GQ GR GS GT GU GW GY HK HM HN HR HT HU ID IE IL IM IN IO IQ IR IS IT JE JM JO JP " +
    "KE KG KH KI KM KN KP KR KW KY KZ LA LB LC LI LK LR LS LT LU LV LY MA MC MD ME MF MG MH MK ML MM MN MO MP MQ MR MS MT " +
    "MU MV MW MX MY MZ NA NC NE NF NG NI NL NO NP NR NU NZ OM PA PE PF PG PH PK PL PM PN PR PS PT PW PY QA RE RO RS RU RW " +
    "SA SB SC SD SE SG SH SI SJ SK SL SM SN SO SR SS ST SV SX SY SZ TC TD TF TG TH TJ TK TL TM TN TO TR TT TV TW TZ " +
    "UA UG UM US UY UZ VA VC VE VG VI VN VU WF WS YE YT ZA ZM ZW").split(" ").toSeq

  val countryAlpha3: Seq[String] = (
    "AND ARE AFG ATG AIA ALB ARM AGO ATA ARG ASM AUT AUS ABW ALA AZE BIH BRB BGD BEL BFA BGR BHR BDI BEN BLM BMU BRN BOL " +
    "BES BRA BHS BTN BVT BWA BLR BLZ CAN CCK COD CAF COG CHE CIV COK CHL CMR CHN COL CRI CUB CPV CUW CXR CYP CZE DEU DJI " +
    "DNK DMA DOM DZA ECU EST EGY ESH ERI ESP ETH FIN FJI FLK FSM FRO FRA GAB GBR GRD GEO GUF GGY GHA GIB GRL GMB GIN GLP " +
    "GNQ GRC SGS GTM GUM GNB GUY HKG HMD HND HRV HTI HUN IDN IRL ISR IMN IND IOT IRQ IRN ISL ITA JEY JAM JOR JPN KEN KGZ " +
    "KHM KIR COM KNA PRK KOR KWT CYM KAZ LAO LBN LCA LIE LKA LBR LSO LTU LUX LVA LBY MAR MCO MDA MNE MAF MDG MHL MKD MLI " +
    "MMR MNG MAC MNP MTQ MRT MSR MLT MUS MDV MWI MEX MYS MOZ NAM NCL NER NFK NGA NIC NLD NOR NPL NRU NIU NZL OMN PAN PER " +
    "PYF PNG PHL PAK POL SPM PCN PRI PSE PRT PLW PRY QAT REU ROU SRB RUS RWA SAU SLB SYC SDN SWE SGP SHN SVN SJM SVK SLE " +
    "SMR SEN SOM SUR SSD STP SLV SXM SYR SWZ TCA TCD ATF TGO THA TJK TKL TLS TKM TUN TON TUR TTO TUV TWN TZA UKR UGA UMI " +
    "USA URY UZB VAT VCT VEN VGB VIR VNM VUT WLF WSM YEM MYT ZAF ZMB ZWE").split(" ").toSeq

  private def resourceLines(name: String): Seq[String] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    require(in != null, s"Missing bundled resource: $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filterNot(l => l.isEmpty || l.startsWith("#")).toList
    finally in.close()
  }

  /** ISO 3166-1 numeric codes (bundled public-standard data). */
  lazy val countryNumeric: Seq[String] =
    resourceLines("iso_3166_1_numeric.txt").flatMap(_.split(" ")).filter(_.nonEmpty)

  val currency: Seq[String] = (
    "AED AFN ALL AMD ANG AOA ARS AUD AWG AZN BAM BBD BDT BGN BHD BIF BMD BND BOB BRL BSD BTN BWP BYN BZD CAD CDF CHF CLP " +
    "CNY COP CRC CUP CVE CZK DJF DKK DOP DZD EGP ERN ETB EUR FJD FKP GBP GEL GHS GIP GMD GNF GTQ GYD HKD HNL HRK HTG HUF " +
    "IDR ILS INR IQD IRR ISK JMD JOD JPY KES KGS KHR KMF KPW KRW KWD KYD KZT LAK LBP LKR LRD LSL LYD MAD MDL MGA MKD MMK " +
    "MNT MOP MRU MUR MVR MWK MXN MYR MZN NAD NGN NIO NOK NPR NZD OMR PAB PEN PGK PHP PKR PLN PYG QAR RON RSD RUB RWF SAR " +
    "SBD SCR SDG SEK SGD SHP SLE SOS SRD SSP STN SVC SYP SZL THB TJS TMT TND TOP TRY TTD TWD TZS UAH UGX USD UYU UZS VES " +
    "VND VUV WST XAF XCD XOF XPF YER ZAR ZMW ZWL").split(" ").toSeq

  /** ISO 4217 numeric codes, three-digit zero-padded (bundled public-standard
    * data, one code per line).
    */
  lazy val currencyNumeric: Seq[String] =
    resourceLines("iso_4217_numeric.txt").map(_.trim).filter(_.nonEmpty)

  /** ISO 639-3 three-letter codes, lowercase (bundled public-standard data —
    * the comprehensive registry, ~7900 languages).
    */
  lazy val language639_3: Seq[String] =
    resourceLines("iso_639_3_alpha_3.txt").map(_.trim).filter(_.nonEmpty)

  /** ISO 639-1 two-letter codes (lowercase). */
  val language639_1: Seq[String] = (
    "aa ab ae af ak am an ar as av ay az ba be bg bh bi bm bn bo br bs ca ce ch co cr cs cu cv cy da de dv dz ee el en eo " +
    "es et eu fa ff fi fj fo fr fy ga gd gl gn gu gv ha he hi ho hr ht hu hy hz ia id ie ig ii ik io is it iu ja jv ka kg " +
    "ki kj kk kl km kn ko kr ks ku kv kw ky la lb lg li ln lo lt lu lv mg mh mi mk ml mn mr ms mt my na nb nd ne ng nl nn " +
    "no nr nv ny oc oj om or os pa pi pl ps pt qu rm rn ro ru rw sa sc sd se sg si sk sl sm sn so sq sr ss st su sv sw ta " +
    "te tg th ti tk tl tn to tr ts tt tw ty ug uk ur uz ve vi vo wa wo xh yi yo za zh zu").split(" ").toSeq

  /** ISO 3166-2 subdivisions, full registry for 200 countries (bundled
    * public-standard data; one line per country, `CC:sub1,sub2,...`).
    */
  lazy val subdivisions: Map[String, Seq[String]] =
    resourceLines("iso_3166_2.txt").map { line =>
      val Array(cc, codes) = line.split(":", 2)
      cc -> codes.split(",").toSeq.map(s => s"$cc-$s")
    }.toMap
}
