package graft.pipeline

/** Frozen public-suffix-list snapshot — the data artifact behind
  * [[UrlOps.registrableDomain]].
  *
  * The registrable domain ("example.co.uk" for "a.b.example.co.uk") is
  * defined by the Mozilla Public Suffix List (publicsuffix.org): the
  * longest matching *rule* is the public suffix, and the registrable
  * domain is that suffix plus one more label. The list is a data
  * artifact, not an algorithm — it changes monthly and carries three
  * rule kinds:
  *
  *  - plain rules (`co.uk`, `github.io`): the rule itself is a public
  *    suffix,
  *  - wildcard rules (`*.ck`, `*.kawasaki.jp`): any single label under
  *    the parent forms a public suffix,
  *  - exception rules (`!www.ck`, `!city.kawasaki.jp`): the named
  *    domain is registrable even though a wildcard covers it —
  *    exceptions beat every other match.
  *
  * Crucially the list has a PRIVATE section: `github.io`,
  * `blogspot.com`, `netlify.app` … are platform suffixes where every
  * user site is a DISTINCT registrable domain. A per-domain cap that
  * lumps all of `*.github.io` into one domain throttles exactly the
  * long-tail content the cap exists to keep — so the private section is
  * included here, not optional.
  *
  * This object is a FROZEN SNAPSHOT in the repo's frozen-literal
  * discipline (the refPqCodebooks pattern): a curated subset of the
  * public list — the high-traffic ccTLD second-level registries, the
  * wildcard/exception families, and the major hosting-platform private
  * suffixes — checked into source so the operator is deterministic and
  * hermetic. Swapping in a fuller (or newer) snapshot is a data edit at
  * this seam; [[PslSnapshotSpec]] asserts the structural invariants any
  * replacement must keep (lowercase, deduplicated, label-count bounds,
  * every exception covered by a wildcard parent).
  */
object PslSnapshot {
  /** ICANN-section two-label rules (ccTLD second-level registries). */
  val icannTwoLabel: Seq[String] = Seq(
    // uk
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "police.uk", "sch.uk",
    // au
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    // jp
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    // br
    "com.br", "edu.br", "gov.br", "mil.br", "net.br", "org.br",
    // cn
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn", "org.cn",
    // mx
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    // in
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "net.in", "org.in", "res.in",
    // kr
    "ac.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "ms.kr", "ne.kr",
    "or.kr", "pe.kr", "re.kr",
    // za
    "ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za", "net.za",
    "org.za", "web.za",
    // tr
    "com.tr", "edu.tr", "gen.tr", "gov.tr", "k12.tr", "net.tr",
    "org.tr", "web.tr",
    // nz
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "kiwi.nz",
    "maori.nz", "net.nz", "org.nz", "school.nz",
    // il
    "ac.il", "co.il", "gov.il", "k12.il", "muni.il", "net.il", "org.il",
    // sg / my / hk / tw
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg",
    "com.my", "edu.my", "gov.my", "mil.my", "net.my", "org.my",
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "com.tw", "edu.tw", "gov.tw", "idv.tw", "mil.tw", "net.tw", "org.tw",
    // ar / co / pe / ve / uy / ec / bo / py / cr / do / gt / cl
    "com.ar", "edu.ar", "gob.ar", "gov.ar", "int.ar", "mil.ar",
    "net.ar", "org.ar",
    "com.co", "edu.co", "gov.co", "mil.co", "net.co", "nom.co", "org.co",
    "com.pe", "edu.pe", "gob.pe", "mil.pe", "net.pe", "nom.pe", "org.pe",
    "com.ve", "edu.ve", "gob.ve", "mil.ve", "net.ve", "org.ve",
    "com.uy", "edu.uy", "gub.uy", "mil.uy", "net.uy", "org.uy",
    "com.ec", "edu.ec", "fin.ec", "gob.ec", "gov.ec", "info.ec",
    "med.ec", "mil.ec", "net.ec", "org.ec", "pro.ec",
    "com.bo", "edu.bo", "gob.bo", "int.bo", "mil.bo", "net.bo",
    "org.bo", "tv.bo",
    "com.py", "coop.py", "edu.py", "gov.py", "mil.py", "net.py", "org.py",
    "ac.cr", "co.cr", "ed.cr", "fi.cr", "go.cr", "or.cr", "sa.cr",
    "com.do", "edu.do", "gob.do", "gov.do", "mil.do", "net.do",
    "org.do", "sld.do", "web.do",
    "com.gt", "edu.gt", "gob.gt", "ind.gt", "mil.gt", "net.gt", "org.gt",
    "gob.cl", "gov.cl", "mil.cl",
    // ua / pl / es / pt / gr / it / fr / ca
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    "com.pl", "edu.pl", "gov.pl", "mil.pl", "net.pl", "org.pl", "waw.pl",
    "com.es", "edu.es", "gob.es", "nom.es", "org.es",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "org.pt",
    "com.gr", "edu.gr", "gov.gr", "net.gr", "org.gr",
    "edu.it", "gov.it",
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr",
    "gc.ca",
    // th / vn / ph / id
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "com.vn", "edu.vn", "gov.vn", "int.vn", "net.vn", "org.vn",
    "com.ph", "edu.ph", "gov.ph", "net.ph", "org.ph",
    "ac.id", "co.id", "go.id", "mil.id", "net.id", "or.id", "sch.id",
    "web.id",
    // eg / sa / ng / ke / pk
    "com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "net.eg",
    "org.eg", "sci.eg",
    "com.sa", "edu.sa", "gov.sa", "med.sa", "net.sa", "org.sa",
    "pub.sa", "sch.sa",
    "com.ng", "edu.ng", "gov.ng", "mil.ng", "net.ng", "org.ng", "sch.ng",
    "ac.ke", "co.ke", "go.ke", "info.ke", "me.ke", "mobi.ke", "ne.ke",
    "or.ke", "sc.ke",
    "biz.pk", "com.pk", "edu.pk", "fam.pk", "gov.pk", "net.pk",
    "org.pk", "web.pk")

  /** PRIVATE-section two-label rules — hosting platforms where each
    * user site is its own registrable domain. The rules the 16-entry
    * heuristic this snapshot replaced could not express.
    */
  val privateTwoLabel: Seq[String] = Seq(
    "github.io", "githubusercontent.com", "gitlab.io", "bitbucket.io",
    "codeberg.page",
    "blogspot.com", "blogspot.de", "blogspot.fr", "blogspot.in",
    "blogspot.it", "blogspot.jp", "blogspot.mx",
    "wordpress.com", "wixsite.com", "neocities.org", "readthedocs.io",
    "netlify.app", "vercel.app", "now.sh", "surge.sh", "glitch.me",
    "onrender.com", "fly.dev", "deno.dev", "repl.co",
    "herokuapp.com", "elasticbeanstalk.com",
    "appspot.com", "firebaseapp.com", "web.app", "run.app",
    "cloudfunctions.net", "translate.goog",
    "pages.dev", "workers.dev",
    "azurewebsites.net", "azurestaticapps.net", "cloudfront.net",
    "shinyapps.io", "streamlit.app", "hf.space", "duckdns.org")

  /** Three-label plain rules (ICANN + private). */
  val threeLabel: Seq[String] = Seq(
    "s3.amazonaws.com",
    "blogspot.co.nz", "blogspot.co.uk", "blogspot.co.za",
    "blogspot.com.ar", "blogspot.com.au", "blogspot.com.br",
    "blogspot.com.es")

  /** Wildcard rules, stored as the PARENT (`*.ck` → "ck"): any single
    * extra label under a parent is a public suffix.
    */
  val wildcardParents: Seq[String] = Seq(
    // ccTLDs that delegate every second level
    "bd", "ck", "er", "fk", "jm", "kh", "mm", "np", "pg",
    // Japanese designated-city geographic registries
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp",
    // private: EC2 per-region hostnames
    "compute.amazonaws.com")

  /** Exception rules (`!www.ck` → "www.ck"): registrable despite a
    * covering wildcard; an exception beats every other match.
    */
  val exceptions: Seq[String] = Seq(
    "www.ck",
    "city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
    "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
    "city.yokohama.jp")

  // ------------------------------------------------------- derived sets
  private def labels(r: String): Int = r.count(_ == '.') + 1

  /** Plain rules grouped by label count (single-label rules are implied
    * by the PSL's default `*` rule and never listed).
    */
  val exactByLen: Map[Int, Seq[String]] =
    (icannTwoLabel ++ privateTwoLabel ++ threeLabel)
      .distinct.sorted.groupBy(labels)

  /** Wildcard parents grouped by the PARENT's label count (a parent of
    * k labels makes (k+1)-label public suffixes).
    */
  val wildcardByLen: Map[Int, Seq[String]] =
    wildcardParents.distinct.sorted.groupBy(labels)

  /** Exceptions grouped by label count. */
  val exceptionsByLen: Map[Int, Seq[String]] =
    exceptions.distinct.sorted.groupBy(labels)

  /** Longest public suffix this snapshot can produce, in labels. */
  val maxSuffixLabels: Int =
    (exactByLen.keys ++ wildcardByLen.keys.map(_ + 1)).max
}
