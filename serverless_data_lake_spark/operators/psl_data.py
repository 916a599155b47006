"""Static public-suffix subset for registrable-domain extraction.

A curated subset of the Public Suffix List (publicsuffix.org — the
Mozilla-maintained, openly licensed registry of suffixes under which
domains are registered) covering the ccTLDs whose SECOND level is a
public suffix (``co.uk``, ``com.au``, …), the Japanese prefecture
geographic domains (``tokyo.jp``, … — also 2-label suffixes), and
the 3-label US locality families (``k12.<state>.us`` etc.). The
sets are small enough to ship as in-row literal arrays (no join, no
shuffle — a few hundred strings in the codegen'd plan), and the
2-label fallback in :func:`operators.mixing.extract_domain` remains
correct for every host whose suffix is a plain TLD. Deeper public
suffixes not shipped (e.g. the ~1700 Japanese city domains,
``<city>.<pref>.jp``) fall back to the next-shallower answer —
``foo.aisai.aichi.jp`` groups as ``aisai.aichi.jp`` via the
prefecture entry rather than its true registrable 4-label form; a
tail confined to city-level JP hosts. Swap in the full list by
extending these tuples; the expression logic is length-agnostic per
entry.
"""

from __future__ import annotations

# fmt: off
PUBLIC_SUFFIXES_2LABEL: tuple[str, ...] = (
    # United Kingdom
    "co.uk", "org.uk", "net.uk", "ac.uk", "gov.uk", "me.uk",
    "ltd.uk", "plc.uk", "sch.uk", "nhs.uk",
    # Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "asn.au",
    # New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "maori.nz", "iwi.nz",
    # Japan
    "co.jp", "ne.jp", "or.jp", "go.jp", "ac.jp", "ad.jp", "ed.jp",
    "lg.jp", "gr.jp",
    # Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
    "art.br", "blog.br",
    # China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "mil.cn",
    # India
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in",
    "gov.in", "ac.in", "edu.in", "res.in", "mil.in", "nic.in",
    # South Africa
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    "edu.za", "mil.za",
    # South Korea
    "co.kr", "or.kr", "ne.kr", "go.kr", "ac.kr", "re.kr", "pe.kr",
    "mil.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr",
    # Taiwan
    "com.tw", "org.tw", "net.tw", "edu.tw", "gov.tw", "idv.tw",
    "mil.tw",
    # Hong Kong
    "com.hk", "org.hk", "net.hk", "edu.hk", "gov.hk", "idv.hk",
    # Singapore
    "com.sg", "org.sg", "net.sg", "edu.sg", "gov.sg", "per.sg",
    # Malaysia
    "com.my", "org.my", "net.my", "edu.my", "gov.my", "mil.my",
    "name.my",
    # Turkey
    "com.tr", "org.tr", "net.tr", "edu.tr", "gov.tr", "mil.tr",
    "av.tr", "bel.tr", "gen.tr", "web.tr",
    # Argentina
    "com.ar", "org.ar", "net.ar", "edu.ar", "gob.ar", "mil.ar",
    "int.ar",
    # Mexico
    "com.mx", "org.mx", "gob.mx", "edu.mx", "net.mx",
    # Colombia
    "com.co", "org.co", "net.co", "edu.co", "gov.co", "mil.co",
    "nom.co",
    # Peru
    "com.pe", "org.pe", "net.pe", "edu.pe", "gob.pe", "mil.pe",
    "nom.pe",
    # Venezuela
    "com.ve", "org.ve", "net.ve", "edu.ve", "gob.ve", "mil.ve",
    "web.ve",
    # Israel
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "k12.il", "idf.il",
    # Thailand
    "co.th", "or.th", "ac.th", "go.th", "in.th", "net.th", "mi.th",
    # Egypt
    "com.eg", "org.eg", "net.eg", "edu.eg", "gov.eg", "sci.eg",
    "eun.eg", "mil.eg", "name.eg",
    # Saudi Arabia
    "com.sa", "org.sa", "net.sa", "edu.sa", "gov.sa", "med.sa",
    "sch.sa", "pub.sa",
    # Pakistan
    "com.pk", "org.pk", "net.pk", "edu.pk", "gov.pk", "gob.pk",
    "fam.pk", "biz.pk", "web.pk",
    # Bangladesh
    "com.bd", "org.bd", "net.bd", "edu.bd", "gov.bd", "ac.bd",
    "mil.bd",
    # Nigeria
    "com.ng", "org.ng", "net.ng", "edu.ng", "gov.ng", "sch.ng",
    "name.ng", "mobi.ng", "mil.ng", "i.ng",
    # Indonesia
    "co.id", "or.id", "ac.id", "go.id", "web.id", "sch.id",
    "net.id", "my.id", "biz.id", "desa.id", "ponpes.id",
    # Ukraine
    "com.ua", "org.ua", "net.ua", "edu.ua", "gov.ua", "in.ua",
    "kiev.ua",
    # Vietnam
    "com.vn", "org.vn", "net.vn", "edu.vn", "gov.vn", "ac.vn",
    "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    # Philippines
    "com.ph", "org.ph", "net.ph", "edu.ph", "gov.ph", "ngo.ph",
    "mil.ph", "i.ph",
    # Kenya
    "co.ke", "or.ke", "ac.ke", "go.ke", "ne.ke", "sc.ke", "me.ke",
    "mobi.ke", "info.ke",
    # Greece
    "com.gr", "org.gr", "net.gr", "edu.gr", "gov.gr",
    # Poland (second-level functional; city domains omitted)
    "com.pl", "org.pl", "net.pl", "edu.pl", "gov.pl", "mil.pl",
    "biz.pl", "info.pl", "waw.pl",
    # Portugal
    "com.pt", "org.pt", "edu.pt", "gov.pt", "int.pt", "net.pt",
    "nome.pt", "publ.pt",
    # Russia (functional second-level)
    "com.ru", "net.ru", "org.ru", "pp.ru", "msk.ru", "spb.ru",
    # Japan — the 47 prefecture geographic domains are 2-label
    # public suffixes on the PSL (registrations live under them,
    # e.g. metro.tokyo.jp): r8, closes the prefecture over-grouping
    # the r7 note documented.
    "hokkaido.jp", "aomori.jp", "iwate.jp", "miyagi.jp", "akita.jp",
    "yamagata.jp", "fukushima.jp", "ibaraki.jp", "tochigi.jp",
    "gunma.jp", "saitama.jp", "chiba.jp", "tokyo.jp", "kanagawa.jp",
    "niigata.jp", "toyama.jp", "ishikawa.jp", "fukui.jp",
    "yamanashi.jp", "nagano.jp", "gifu.jp", "shizuoka.jp",
    "aichi.jp", "mie.jp", "shiga.jp", "kyoto.jp", "osaka.jp",
    "hyogo.jp", "nara.jp", "wakayama.jp", "tottori.jp",
    "shimane.jp", "okayama.jp", "hiroshima.jp", "yamaguchi.jp",
    "tokushima.jp", "kagawa.jp", "ehime.jp", "kochi.jp",
    "fukuoka.jp", "saga.jp", "nagasaki.jp", "kumamoto.jp",
    "oita.jp", "miyazaki.jp", "kagoshima.jp", "okinawa.jp",
)

_US_STATES: tuple[str, ...] = (
    "ak", "al", "ar", "az", "ca", "co", "ct", "dc", "de", "fl",
    "ga", "hi", "ia", "id", "il", "in", "ks", "ky", "la", "ma",
    "md", "me", "mi", "mn", "mo", "ms", "mt", "nc", "nd", "ne",
    "nh", "nj", "nm", "nv", "ny", "oh", "ok", "or", "pa", "ri",
    "sc", "sd", "tn", "tx", "ut", "va", "vt", "wa", "wi", "wv",
    "wy",
)

#: The US state domains themselves are 2-label public suffixes
#: (``ca.us``, ``tx.us``, …) — appended so a bare locality host like
#: ``k12.tx.us`` resolves through the 2-label branch.
PUBLIC_SUFFIXES_2LABEL = PUBLIC_SUFFIXES_2LABEL + tuple(
    f"{st}.us" for st in _US_STATES
)

#: 3-label public suffixes (r8): the US locality families — the PSL
#: lists ``k12.<state>.us``, ``cc.<state>.us`` (community colleges)
#: and ``lib.<state>.us`` (libraries) as public suffixes, so
#: ``district.k12.ca.us`` is a registrable domain (the last FOUR
#: labels of ``www.school.district.k12.ca.us``). Generated for all
#: 51 state codes × 3 kinds (153 strings) — the live PSL carves out
#: a small tail of exceptions within these families (not every
#: state lists all three registries), so like the JP city domains
#: this curated subset should be cross-checked against
#: publicsuffix.org before production use.
PUBLIC_SUFFIXES_3LABEL: tuple[str, ...] = tuple(
    f"{kind}.{st}.us"
    for kind in ("k12", "cc", "lib")
    for st in _US_STATES
)
# fmt: on
