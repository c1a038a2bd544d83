"""Public-suffix list snapshot + registered-domain SQL (VERDICT r13
ask 4).

`registered_domain` previously used a 12-combination mini-list
(co/ac/com/org x uk/jp/au); a crawl-scale corpus hits `com.br`,
`co.in`, `github.io` immediately, and the RefinedWeb-style domain cap
then under- or over-caps whole countries.  This module embeds a
curated snapshot SUBSET of the public suffix list (publicsuffix.org
— public data; the build environment has no network, so this is a
transcribed subset, not the fetched file):

- `PSL_EXACT`: ~4.2k exact rules (4,160 at the r16 extension) —
  every delegated TLD we enumerate (legacy + ~750 new-program
  generic/geo/brand strings + ~100 IDN punycode TLDs) plus the
  well-known second/third-level registry structures (ccTLD
  com/net/org/... families, the 47 .jp prefectures + the 23 Tokyo
  special wards, the .us state/k12/cc/lib grid, the Italian
  region/province grid, the Polish geographic grid, the
  Russian/Ukrainian regional families, the 63 Vietnamese province
  rules, the Norwegian county/municipality block, the Brazilian
  city grid, .kr metros, .cn provinces, the single-letter .se and
  .bg grids, the .au state grids under edu/gov) and the widely-used
  PRIVATE section hosts (github.io, the ~66-country blogspot
  family, the Akamai/Fastly CDN grids, s3.amazonaws.com,
  translate.goog, ...).
- `PSL_WILDCARD`: the classic `*.tld` wildcard bases (bd ck er fk
  jm kh mm np pg — any 2-label tail under them is a public suffix)
  plus the multi-label bases: the 7 Japanese designated-city rules
  (*.kawasaki.jp, ...), *.sch.uk (UK schools — r16 fix, previously
  mis-transcribed as an exact rule), and the AWS per-instance rules
  (*.compute.amazonaws.com, *.compute-1.amazonaws.com,
  *.elb.amazonaws.com).
- `PSL_EXCEPTIONS`: `!` exception rules (www.ck, the 7
  city.<jp-city>.jp rules) — carved back OUT of a wildcard, i.e.
  registrable themselves.

Semantics follow the PSL algorithm: longest matching rule wins,
exceptions beat wildcards, and an UNLISTED TLD falls back to the
default `*` rule (last label is the suffix) — so hosts under TLDs
this subset omits degrade to the last-two-labels behavior, never to
an error.  The subset is documented as such; swapping in the full
fetched list is a data change only (`load_psl_file` parses the
standard file format into the same three rule sets).

SQL surface: `psl_values_sql()` renders exact rules as an inline
VALUES relation (identical text in Spark and DuckDB — a broadcast in
Spark and a constant table in DuckDB), and
`reg_domain_ctes`/`reg_domain_expr` emit the longest-match logic over
candidate 2/3/4-label tails of `host`.  Each tail probe joins ONLY
its own label-count rule bucket (r15 trim, VERDICT r14 ask 2): the
~800 single-label TLD rules are covered by the default rule and
rendered in no join at all, so the broadcast volume is ~2.3k rows
total across 2-3 joins instead of 3 x 3.1k.  At 100 TB this is 2-3
BROADCAST hash joins on a pure projection — the corpus is never
shuffled for domain derivation.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# ICANN section: top-level domains (each TLD is itself a rule)
# ---------------------------------------------------------------------------

_TLDS = """
ac ad ae aero af ag ai al am ao aq ar arpa as asia at au aw ax az
ba bb bd be bf bg bh bi biz bj bm bn bo br bs bt bw by bz
ca cat cc cd cf cg ch ci ck cl cm cn co com coop cr cu cv cw cx cy cz
de dj dk dm do dz ec edu ee eg es et eu fi fj fk fm fo fr
ga gd ge gf gg gh gi gl gm gn gov gp gq gr gs gt gu gw gy
hk hm hn hr ht hu id ie il im in info int io iq ir is it
je jm jo jobs jp ke kg kh ki km kn kp kr kw ky kz
la lb lc li lk lr ls lt lu lv ly ma mc md me mg mh mil mk ml mm mn mo
mobi mp mq mr ms mt mu museum mv mw mx my mz
na name nc ne net nf ng ni nl no np nr nu nz om
org pa pe pf pg ph pk pl pm pn pr pro ps pt pw py qa re ro rs ru rw
sa sb sc sd se sg sh si sk sl sm sn so sr ss st su sv sx sy sz
tc td tel tf tg th tj tk tl tm tn to tr travel tt tv tw tz
ua ug uk us uy uz va vc ve vg vi vn vu wf ws xxx ye yt za zm zw
app art blog cloud club dev design digital email games group life
live media network news online page shop site space store systems
tech today website wiki work works world xyz zone
""".split()

# ---------------------------------------------------------------------------
# ICANN section: second-level registry structures, tld -> label list
# (the widely-documented national registry families)
# ---------------------------------------------------------------------------

_SECOND_LEVEL: dict[str, str] = {
    "uk": "ac co gov judiciary ltd me net nhs org plc police",
    "jp": ("ac ad co ed go gr lg ne or "
           # the 47 prefectures are direct 2nd-level public suffixes
           "hokkaido aomori iwate miyagi akita yamagata fukushima "
           "ibaraki tochigi gunma saitama chiba tokyo kanagawa "
           "niigata toyama ishikawa fukui yamanashi nagano gifu "
           "shizuoka aichi mie shiga kyoto osaka hyogo nara wakayama "
           "tottori shimane okayama hiroshima yamaguchi tokushima "
           "kagawa ehime kochi fukuoka saga nagasaki kumamoto oita "
           "miyazaki kagoshima okinawa"),
    "au": "asn com edu gov id net org act nsw nt qld sa tas vic wa",
    "nz": ("ac co cri geek gen govt health iwi kiwi maori mil net "
           "org parliament school"),
    "za": "ac co edu gov law mil net nom org school web",
    "br": ("adv agr am arq art ato b bio blog bmd cim cng cnt com "
           "coop ecn eco edu emp eng esp etc eti far flog fm fnd fot "
           "fst g12 ggf gov imb ind inf jor jus leg lel mat med mil "
           "mp mus net nom not ntr odo org ppg pro psc psi qsl radio "
           "rec slg srv taxi teo tmp trd tur tv vet vlog wiki zlg"),
    "in": "ac co edu firm gen gov ind mil net nic org res",
    "cn": ("ac com edu gov mil net org "
           "ah bj cq fj gd gs gx gz ha hb he hi hl hn jl js jx ln "
           "nm nx qh sc sd sh sn sx tj tw xj xz yn zj mo"),
    "kr": ("ac co es go hs kg mil ms ne or pe re sc "
           "seoul busan daegu incheon gwangju daejeon ulsan gyeonggi "
           "gangwon chungbuk chungnam jeonbuk jeonnam gyeongbuk "
           "gyeongnam jeju"),
    "mx": "com edu gob net org",
    "ar": "bet com coop edu gob gov int mil musica mutual net org tur",
    "tr": ("av bbs bel biz com dr edu gen gov info k12 kep mil name "
           "net org pol tel tsk tv web"),
    "ua": "com edu gov in net org",
    "ru": "ac edu gov int mil test",
    "pl": ("agro aid atm auto biz com edu gov info mil net org priv "
           "shop sklep sos targi tm tourism travel waw warszawa "
           "krakow poznan wroclaw gdansk gda lublin lodz bialystok "
           "katowice olsztyn opole radom rzeszow szczecin torun "
           "zgora gorzow slupsk"),
    "th": "ac co go in mi net or",
    "id": "ac biz co desa go mil my net or ponpes sch web",
    "my": "com edu gov mil name net org",
    "sg": "com edu gov net org per",
    "hk": "com edu gov idv net org",
    "tw": "club com ebiz edu game gov idv mil net org",
    "ph": "com edu gov i mil net ngo org",
    "vn": "ac biz com edu gov health info int name net org pro",
    "il": "ac co gov idf k12 muni net org",
    "fr": ("aeroport asso avocat cci chambagri com gouv greta nom "
           "notaires pharmacien port prd tm"),
    "es": "com edu gob nom org",
    "pt": "com edu gov int net nome org publ",
    "gr": "com edu gov net org",
    "ro": "arts com firm info nom nt org rec store tm www",
    "hu": ("2000 agrar bolt casino city co erotica erotika film forum "
           "games hotel info ingatlan jogasz konyvelo lakas media "
           "news org priv reklam sex shop sport suli szex tm tozsde "
           "utazas video"),
    "at": "ac co gv or priv",
    "be": "ac",
    "no": ("dep fhs folkebibl fylkesbibl herad idrett kommune mil "
           "museum priv stat vgs"),
    "se": ("a ac b bd brand c d e f fh fhsk fhv g h i k komforb "
           "kommunalforbund komvux l lanbib m n naturbruksgymn o org "
           "p parti pp press r s t tm u w x y z"),
    "fi": "aland",
    "ca": "ab bc gc mb nb nf nl ns nt nu on pe qc sk yk",
    "ke": "ac co go info me mobi ne or sc",
    "ng": "com edu gov i mil mobi name net org sch",
    "tz": "ac co go hotel info me mil mobi ne or sc tv",
    "ug": "ac co com go ne or org sc",
    "gh": "com edu gov mil org",
    "eg": "com edu eun gov mil name net org sci",
    "ma": "ac co gov net org press",
    "sa": "com edu med net org pub sch",
    "ae": "ac co gov mil net org sch",
    "qa": "com edu gov mil name net org sch",
    "kw": "com edu emb gov ind net org",
    "om": "co com edu gov med museum net org pro",
    "jo": "com edu gov mil name net org sch",
    "lb": "com edu gov net org",
    "pk": "biz com edu fam gob gok gon gop gos gov net org web",
    "lk": ("ac assn com edu gov grp hotel int ltd net ngo org sch "
           "soc web"),
    "kz": "com edu gov mil net org",
    "uz": "co com net org",
    "by": "com gov mil of",
    "ge": "com edu gov mil net org pvt",
    "am": "co com commune net org",
    "az": "biz com edu gov info int mil name net org pp pro",
    "ir": "ac co gov id net org sch",
    "cl": "co gob gov mil",
    "pe": "com edu gob mil net nom org",
    "co": "arts com edu firm gov info int mil net nom org rec web",
    "ve": ("arts bib co com e12 edu firm gob gov info int mil net "
           "org rec store tec web"),
    "uy": "com edu gub mil net org",
    "py": "com coop edu gov mil net org",
    "bo": "com edu gob int mil net org tv web",
    "ec": "com edu fin gob gov info k12 med mil net org pro",
    "gt": "com edu gob ind mil net org",
    "cr": "ac co ed fi go or sa",
    "do": "art com edu gob gov mil net org sld web",
    "hn": "com edu gob mil net org",
    "ni": "ac biz co com edu gob in info int mil net nom org web",
    "pa": "abo ac com edu gob ing med net nom org sld",
    "sv": "com edu gob org red",
    "cu": "com edu gov inf net org",
    "tt": "biz co com edu gov info mil name net org pro",
    "bb": "biz co com edu gov info net org store tv",
    "bs": "com edu gov net org",
    "is": "com edu gov int net org",
    "mt": "com edu net org",
    "cy": "ac biz com ekloges gov ltd mil net org press pro tm",
    "lv": "asn com conf edu gov id mil net org",
    "lt": "gov",
    "ee": "aip com edu fie gov lib med org pri riik",
    "hr": "com from iz name",
    "rs": "ac co edu gov in org",
    "bg": ("a b c d e f g h i j k l m n o p q r s t u v w x y z "
           "0 1 2 3 4 5 6 7 8 9"),
    "mk": "com edu gov inf name net org",
    "al": "com edu gov mil net org",
    "ba": "com edu gov mil net org",
    "me": "ac co edu gov its net org priv",
    "mn": "edu gov org",
    "kg": "com edu gov mil net org",
    "tj": ("ac biz co com edu go gov int mil name net nic org test "
           "web"),
    "tm": "co com edu gov mil net nom org",
    "la": "com edu gov int net org per",
    "mo": "com edu gov net org",
    "mv": ("aero biz com coop edu gov info int mil museum name net "
           "org pro"),
    "mu": "ac co com gov net or org",
    "mw": "ac biz co com coop edu gov int museum net org",
    "zm": "ac biz co com edu gov info mil net org sch",
    "zw": "ac co gov mil org",
    "bw": "ac co gov net org",
    "na": ("ac cc co com dr in info mobi mx name or org pro school "
           "tv us ws"),
    "sz": "ac co org",
    "ls": "ac biz co edu gov info net org sc",
    "mz": "ac adv co edu gov mil net org",
    "ao": "co ed edu gv it og org pb",
    "cm": "co com gov net",
    "sn": "art com edu gouv org perso univ",
    "ci": ("ac asso com ed edu go gouv int md net or org presse"),
    "bf": "gov",
    "bj": "gouv",
    "dz": "art asso com edu gov net org pol soc tm",
    "tn": ("com ens fin gov ind info intl mincom nat net org perso "
           "tourism"),
    "ly": "com edu gov id med net org plc sch",
    "sd": "com edu gov info med net org tv",
    "et": "biz com edu gov info name net org",
    "so": "com edu gov me net org",
    "rw": "ac co coop gov mil net org",
    "mg": "co com edu gov mil nom org prd tm",
    "sc": "com edu gov net org",
    "km": "com edu gouv mil nom org prd presse tm",
    "re": "asso com nom",
    "gp": "asso com edu mobi net org",
    "gy": "co com edu gov net org",
    "sb": "com edu gov net org",
    "vu": "com edu net org",
    "fj": "ac biz com gov info mil name net org pro",
    "ws": "com edu gov net org",
    "to": "com edu gov mil net org",
    "nr": "biz com edu gov info net org",
    "ki": "biz com edu gov info net org",
    "fm": "com edu net org",
    "pw": "belau co ed go ne or",
    "as": "gov",
    "gu": "com edu gov guam info net org web",
    "vi": "co com k12 net org",
    "pr": ("ac biz com edu est gov info isla name net org pro prof"),
    "ag": "co com net nom org",
    "ai": "com net off org",
    "aw": "com",
    "bm": "com edu gov net org",
    "bz": "com edu gov net org",
    "dm": "com edu gov net org",
    "kn": "edu gov net org",
    "ky": "com edu gov net org",
    "lc": "co com edu gov net org",
    "ms": "com edu gov net org",
    "tc": "com edu gov net org pro",
    "vc": "com edu gov mil net org",
    "ht": ("adult art asso com coop edu firm gouv info med net org "
           "perso pol pro rel shop"),
    "gi": "com edu gov ltd mod org",
    "im": "ac co com net org tt tv",
    "je": "co net org",
    "gg": "co net org",
    "ac": "com edu gov mil net org",
    "sh": "com gov mil net org",
    "st": ("co com consulado edu embaixada gov mil net org principe "
           "saotome store"),
    "cv": "com edu id int net nome org publ",
    "ml": "com edu gouv gov net org presse",
    "gn": "ac com edu gov net org",
    "lr": "com edu gov net org",
    "sl": "com edu gov net org",
    "mr": "gov",
    "ss": "biz com edu gov me net org sch",
    "cd": "gov",
    "bi": "co com edu or org",
    "mc": "asso tm",
    "ad": "nom",
    "gl": "co com edu net org",
    "cx": "gov",
    "nf": "arts com firm info net other per rec store web",
    "ie": "gov",
    "sy": "com edu gov mil net org",
    "ye": "com edu gov mil net org",
    "iq": "com edu gov mil net org",
    "ps": "com edu gov net org plo sec",
    "bh": "com edu gov net org",
    "af": "com edu gov net org",
    "bt": "com edu gov net org",
    "kp": "com edu gov org rep tra",
    "mm_unused": "",   # *.mm is wildcard; no exact 2nd-levels here
    "td": "gouv",
    "ga": "",
    "nc": "asso nom",
    "pf": "com edu org",
    "tl": "gov",
    "tg": "",
    "ne": "",
    "dj": "",
    "gq": "",
    "gw": "",
    "cf": "",
    "gm": "",
    "cg": "",
    "va": "",
    "sm": "",
    "li": "",
    "fo": "",
    "gs": "",
    "pn": "co edu gov net org",
    "ck_unused": "",   # *.ck wildcard with !www.ck exception
}

# .us: the state grid — <st>.us plus k12/cc/lib.<st>.us
_US_STATES = ("ak al ar az ca co ct dc de fl ga hi ia id il in ks ky "
              "la ma md me mi mn mo ms mt nc nd ne nh nj nm nv ny oh "
              "ok or pa ri sc sd tn tx ut va vt wa wi wv wy").split()

# private section (operator-submitted): the widely-used hosting roots
_PRIVATE = """
github.io gitlab.io blogspot.com appspot.com herokuapp.com
cloudfront.net s3.amazonaws.com elasticbeanstalk.com
azurewebsites.net cloudapp.net netlify.app vercel.app pages.dev
workers.dev web.app firebaseapp.com neocities.org readthedocs.io
glitch.me onrender.com fly.dev surge.sh now.sh wordpress.com
dyndns.org no-ip.org duckdns.org ngrok.io repl.co
""".split()

# ---------------------------------------------------------------------------
# r15 snapshot extension (VERDICT r14 ask 6): more of the published
# list, still transcribed from public knowledge (no network in the
# build container) — delegated new-program gTLDs, the Italian
# region/province grid, the Tokyo special wards, the blogspot
# country family, and more private-section hosting roots.  Every
# entry is a rule the published list carries; the snapshot remains a
# documented SUBSET with the PSL default-rule degrade for anything
# it omits.
# ---------------------------------------------------------------------------

# new-program generic TLDs (delegated strings from the public root)
_GTLDS_EXTRA = """
academy accountant accountants actor agency airforce apartments
archi army associates attorney auction audio auto autos baby band
bank bar bargains baseball basketball beauty beer best bet bible bid
bike bingo bio black blackfriday blue boats bond book boutique box
broadway broker build builders business buzz cab cafe cam camera
camp capital car cards care careers cars casa case cash casino
catering center ceo charity chat cheap christmas church city claims
cleaning click clinic clothing coach codes coffee college community
company computer condos construction consulting contact contractors
cooking cool country coupons courses credit creditcard cricket
cruise cruises dance data date dating day deals degree delivery
democrat dental dentist desi diamonds diet direct directory
discount doctor dog domains download earth eat eco education
energy engineer engineering enterprises equipment estate events
exchange expert exposed express fail faith family fan fans farm
fashion feedback film finance financial fish fishing fit fitness
flights florist flowers fly food football forex forsale forum
foundation free fund furniture futbol fyi gallery game gambling
garden gay gift gifts gives giving glass global gold golf gop
graphics gratis green gripe guide guitars guru hair haus health
healthcare help hiphop hiv hockey holdings holiday homes horse
hospital host hosting hot house how icu immo inc industries ink
institute insurance insure international investments irish ist
jetzt jewelry juegos kaufen kim kitchen kiwi land lat law lawyer
lease legal lgbt limited limo link loan loans lol lotto love ltd
ltda luxe luxury makeup management market marketing markets mba
meet meme memorial men menu mobile moda moe mom money monster
mortgage motorcycles mov movie navy new ngo ninja observer one ong
onl ooo open organic ott ovh partners parts party pay pet pharmacy
phd phone photo photography photos physio pics pictures pink pizza
place plumbing plus poker porn press prof promo properties property
protection pub quest racing radio read realestate realtor realty
recipes red rehab reise reisen rent rentals repair report
republican rest restaurant review reviews rich rip rocks rodeo
rugby run sale salon sarl save school schule science search
security select services sex sexy shoes shopping show singles ski
skin soccer social software solar solutions song soy sport spot
stream studio study style sucks supplies supply support surf
surgery tattoo tax taxi team technology tennis theater theatre
tickets tienda tips tires tools top tours town toys trade trading
training trust tube university uno vacations ventures vet viajes
video villas vin vip vision vodka vote voting voyage wang watch
watches webcam wedding whoswho win wine winners wow wtf yachts yoga
you zip
""".split()

# geographic TLDs (delegated city/region strings)
_GTLDS_GEO = """
alsace amsterdam barcelona bayern berlin boston brussels budapest
bzh capetown cologne corsica cymru durban eus frl gal gent hamburg
helsinki istanbul joburg koeln kyoto london madrid melbourne miami
moscow nagoya nyc okinawa osaka paris quebec rio ruhr saarland scot
stockholm swiss sydney taipei tirol tokyo vegas vlaanderen wales
wien yokohama zuerich
""".split()

# brand TLDs (delegated; the widely-known corporate strings)
_GTLDS_BRAND = """
google youtube gmail android chrome apple amazon aws microsoft
windows xbox office azure bing skype oracle sap nokia samsung sony
canon honda toyota nissan bmw audi ford ferrari fiat seat volvo
volkswagen porsche hyundai lexus mini jaguar landrover bentley
lamborghini maserati alfaromeo visa mastercard americanexpress amex
citi chase hsbc barclays barclaycard netflix nike
""".split()

# .it: the published list carries the full region/province grid —
# regions (with spelling variants), the 103 province names (plus the
# English exonyms), and the two-letter province codes
_IT_REGIONS = """
abruzzo basilicata calabria campania emilia-romagna
friuli-venezia-giulia lazio liguria lombardia lombardy marche
molise piemonte piedmont puglia sardegna sardinia sicilia sicily
toscana tuscany trentino-alto-adige umbria valle-aosta
valle-d-aosta valled-aosta valledaosta veneto aosta-valley
""".split()

_IT_PROVINCE_NAMES = """
agrigento alessandria ancona arezzo ascoli-piceno asti avellino
bari belluno benevento bergamo biella bologna bolzano brescia
brindisi cagliari caltanissetta campobasso caserta catania
catanzaro chieti como cosenza cremona crotone cuneo enna fermo
ferrara firenze florence foggia frosinone genoa genova gorizia
grosseto imperia isernia la-spezia latina lecce lecco livorno lodi
lucca macerata mantova massa-carrara matera messina milan milano
modena monza napoli naples novara nuoro oristano padova padua
palermo parma pavia perugia pesaro-urbino pescara piacenza pisa
pistoia pordenone potenza prato ragusa ravenna reggio-calabria
reggio-emilia rieti rimini roma rome rovigo salerno sassari savona
siena siracusa sondrio taranto teramo terni torino trani trapani
trento treviso trieste turin udine varese venezia venice verbania
vercelli verona vibo-valentia vicenza viterbo
""".split()

_IT_PROVINCE_CODES = """
ag al an ao ap aq ar at av ba bg bi bl bn bo br bs bt bz ca cb ce
ch ci cl cn co cr cs ct cz en fc fe fg fi fm fr ge go gr im is kr
lc le li lo lt lu mb mc me mi mn mo ms mt na no nu og or ot pa pc
pd pe pg pi pn po pr pt pu pv pz ra rc re rg ri rm rn ro sa si so
sp sr ss sv ta te tn to tp tr ts tv ud va vb vc ve vi vr vs vt vv
""".split()

# the 23 Tokyo special wards are direct 3rd-level .jp public suffixes
_JP_TOKYO_WARDS = """
adachi arakawa bunkyo chiyoda chuo edogawa itabashi katsushika kita
koto meguro minato nakano nerima ota setagaya shibuya shinagawa
shinjuku suginami sumida taito toshima
""".split()

# the blogspot country family (each is a private-section rule;
# tails after the literal 'blogspot.')
_BLOGSPOT_CC = """
ae al am ba be bg bj ca cf ch cl co.at co.id co.il co.ke co.nz
co.uk co.za com com.ar com.au com.br com.by com.co com.cy com.ee
com.eg com.es com.mt com.ng com.tr com.uy cv cz de dk fi fr gr hk
hr hu ie in is it jp kr li lt lu md mk mr mx my nl no pe pt qa re
ro rs ru se sg si sk sn td tw ug vn
""".split()

# more private-section hosting roots (operator-submitted rules)
_PRIVATE_EXTRA = """
githubusercontent.com bitbucket.io sourceforge.io jimdofree.com
webflow.io wixsite.com pythonanywhere.com deno.dev streamlit.app
hf.space stackblitz.io azurestaticapps.net trafficmanager.net
ngrok-free.app ngrok.app sakura.ne.jp livejournal.com
over-blog.com canalblog.com dreamhosters.com dynv6.net
translate.goog msk.ru spb.ru
""".split()

# additional .us second-level registry rules
_US_EXTRA = "dni fed isa kids nsn".split()

# IDN ccTLDs (punycode form — the form crawl hostnames carry; the
# published list also prints the unicode twins as comments)
_TLDS_IDN = """
xn--p1ai xn--90ais xn--j1amh xn--fiqs8s xn--fiqz9s xn--kprw13d
xn--kpry57d xn--3e0b707e xn--h2brj9c xn--mgbaam7a8h
xn--mgberp4a5d4ar xn--wgbh1c xn--ygbi2ammx xn--mgbayh7gpa
xn--mgba3a4f16a xn--node xn--qxam
""".split()

# .au state grids under edu.au / gov.au
_AU_STATES = "act nsw nt qld sa tas vic wa".split()

# ---------------------------------------------------------------------------
# r16 snapshot extension (VERDICT r15 ask 6): further toward the
# published list, still transcribed from public knowledge.  New
# blocks: ~280 more delegated brand/generic gTLD strings, the ~88
# remaining IDN TLDs (punycode computed and verified locally from
# the unicode strings), the Polish geographic grid, the Russian and
# Ukrainian regional families, the 63 Vietnamese province rules
# (NIXI-style 2022 additions), the Norwegian county codes + ASCII
# municipality names, the Brazilian city-abbreviation grid, the .in
# 2023 expansion, and the Akamai/Google/Shopify private-section
# hosting roots.  Every entry is a rule the published list carries;
# the snapshot remains a documented SUBSET with the PSL default-rule
# degrade for anything it omits.
# ---------------------------------------------------------------------------

_GTLDS_BRAND_R16 = """
abbott abbvie accenture aco aeg aetna afl agakhan aigo airbus
airtel akdn alibaba alipay allfinanz allstate ally alstom amfam
amica aol aquarelle aramco arte asda athleta auspost axa baidu
bananarepublic barefoot bauhaus bbc bbt bbva bcg beats bentley
bestbuy bharti bloomberg bms bnpparibas boehringer bofa bom bosch
bostik bradesco bridgestone brother bugatti calvinklein capitalone
caravan cartier cba cbre cern cfa chanel chintai cipriani cisco
citadel citic clubmed comcast commbank crown crs cuisinella dabur
datsun dclk dell deloitte delta dhl discover dish dnp dunlop
dupont dvag edeka emerck epson ericsson erni esurance etisalat
eurovision extraspace fage fairwinds farmers fedex ferrero
fidelity firestone firmdale flickr flir flsmidth fox fresenius
frontier fujitsu gallo gallup gap gbiz gdn gea genting george ggee
gildan glade gle globo gmo gmx godaddy goldpoint goodyear goog
grainger guardian gucci guge hbo hdfc hdfcbank hermes hisamitsu
hitachi hkt homedepot homegoods homesense hotmail hughes hyatt ibm
ieee ifm ikano imdb infiniti intuit ipiranga itau itv jcb jio jll
jmp jnj jpmorgan juniper kddi kerryhotels kerrylogistics
kerryproperties kfh kia kindle komatsu kpmg kpn kred kuokgroup
lacaixa lancaster lasalle latrobe lds leclerc lego lidl lifestyle
lilly lincoln linde lipsy lixil locus lotte lpl lplfinancial
lundbeck macys maif mango marriott marshalls mattel mckinsey
metlife mit mitsubishi mlb mma monash mormon moto movistar msd mtn
mtr nab nationwide natura nba nec netbank neustar newholland nfl
nhk nico nikon nissay norton nra ntt obi olayan olayangroup
oldnavy ollo omega orange origins otsuka panasonic pccw pfizer
philips piaget pictet ping pioneer playstation pnc pohl politie
pramerica praxi prod progressive pru prudential pwc qvc redstone
reliance ren rexroth richardli ricoh rmit rogers rwe safety sakura
samsclub sandvik sandvikcoromant sanofi sas saxo sbi sbs sca scb
schaeffler schmidt schwarz scjohnson seek sener ses sew sfr
shangrila sharp shaw shell shriram sina smart sncf softbank sohu
spiegel stada staples star starhub statebank statefarm stc
stcgroup suzuki swatch taobao target tatamotors tci tdk telefonica
temasek teva thd tiaa tiffany tjmaxx tjx tkmaxx tmall toray
toshiba total trv tui tvs ubank ubs unicom uol ups vanguard
verisign vig viking virgin vista vistaprint vivo walmart walter
wanggou weatherchannel weber weir williamhill wme wolterskluwer
woodside wtc xerox xfinity xihuan yahoo yamaxun yandex yodobashi
zappos zara zippo
""".split()

_GTLDS_GENERIC_R16 = """
abogado africa apartments author bot buy call channel circle
compare coupon cpa dad dds deal dealer diy docs dot drive dtv dvr
fast fire fling foo fun gent grocery hangout here hotels ice
imamat immobilien ing ira ismaili java joy kid kids kosher latino
lifeinsurance like living llc llp map meme? mint mobily moi music
nexus now nowruz nowtv pars pay pid pin play prime pro qpon room
rsvp safe scholarships secure shia shouji silk sling smile spa
talk tank tunes tushu vana wed xin yun zero
""".replace("meme?", "").split()

_GTLDS_GEO_R16 = """
abudhabi doha dubai krd kyiv ryukyu tatar
""".split()

# remaining IDN TLDs (punycode — computed and round-trip-verified
# from the unicode strings with the local idna codec; the published
# list prints the unicode twins as comments)
_TLDS_IDN_R16 = """
xn--1ck2e1b xn--1qqw23a xn--2scrj9c xn--3bst00m xn--3ds443g
xn--3pxu8k xn--45brj9c xn--45q11c xn--4dbrk0ce xn--4gbrim
xn--55qw42g xn--55qx5d xn--6frz82g xn--6qq986b3xl xn--80adxhks
xn--80ao21a xn--80aqecdr1a xn--80asehdb xn--80aswg xn--90a3ac
xn--90ae xn--9et52u xn--9krt00a xn--bck1b9a5dre4c xn--c1avg
xn--cck2b3b xn--cg4bki xn--czr694b xn--czrs0t xn--czru2d
xn--d1acj3b xn--d1alf xn--e1a4c xn--eckvdtc9d xn--fhbei
xn--fiq228c5hs xn--fjq720a xn--fpcrj9c3d xn--fzc2c9e2c
xn--g2xx48c xn--gckr3f0f xn--gecrj9c xn--hxt814e xn--io0a7i
xn--j1aef xn--j6w193g xn--kput3i xn--l1acc xn--lgbbat1ad8j
xn--mgb9awbf xn--mgbab2bd xn--mgbah1a3hjkrd xn--mgbai9azgqp6j
xn--mgbc0a9azcg xn--mgbca7dzdo xn--mgbcpq6gpa1a xn--mgbpl2fh
xn--mgbtf8fl xn--mgbtx2b xn--mgbx4cd0ab xn--mix082f xn--mix891f
xn--mk1bu44c xn--ngbc5azd xn--ngbrx xn--nqv7f xn--o3cw4h
xn--ogbpf8fl xn--p1acf xn--pgbs0dh xn--q9jyb4c xn--qcka1pmc
xn--qxa6a xn--rhqv96g xn--rvc1e0am3e xn--s9brj9c xn--ses554g
xn--t60b56a xn--tckwe xn--unup4y xn--vhquv xn--vuq861b
xn--wgbl6a xn--xhq521b xn--xkc2al3hye2a xn--xkc2dl3a5ee0h
xn--y9a3aq xn--yfro4i67o xn--zfr164b
""".split()

# .pl: the published geographic grid (city/region names)
_PL_GEO = """
augustow babia-gora bedzin beskidy bialowieza bielawa bieszczady
boleslawiec bydgoszcz bytom cieszyn czeladz czest dlugoleka elblag
elk glogow gniezno gorlice grajewo ilawa jaworzno jelenia-gora
jgora kalisz karpacz kartuzy kaszuby kazimierz-dolny kepno ketrzyn
klodzko kobierzyce kolobrzeg konin konskowola kutno lapy lebork
legnica lezajsk limanowa lomza lowicz lubin lukow malbork
malopolska mazowsze mazury mielec mielno mragowo naklo nowaruda
nysa olawa olecko olkusz opoczno ostroda ostroleka ostrowiec
ostrowwlkp pila pisz podhale polkowice pomorze prochowice pruszkow
przeworsk pulawy rawa-maz rybnik rzgow sanok sejny skoczow
sosnowiec stalowa-wola starachowice stargard suwalki swidnica
swiebodzin swinoujscie szczytno tarnobrzeg tgory turek tychy ustka
walbrzych warmia wegrow wielun wlocl wloclawek wodzislaw wolomin
wroc zachpomor zagan zarow zgorzelec
""".split()

# .ru: the regional family (historically ICANN-section; the current
# list carries them in the private section — same rule semantics)
_RU_GEO = """
adygeya altai amur arkhangelsk astrakhan bashkiria belgorod bir
bryansk buryatia cbg chel chelyabinsk chita chukotka chuvashia
dagestan dudinka e-burg grozny irkutsk ivanovo izhevsk jar
joshkar-ola kalmykia kaluga kamchatka karelia kazan kchr kemerovo
khabarovsk khakassia khv kirov koenig komi kostroma krasnoyarsk
kuban kurgan kursk lipetsk magadan mari mari-el marine mordovia
murmansk nalchik nnov novosibirsk omsk orenburg oryol palana penza
perm ptz rnd ryazan sakhalin samara saratov simbirsk smolensk
stavropol stv surgut tambov tatarstan tom tomsk tsaritsyn tsk tula
tuva tver tyumen udm udmurtia ulan-ude vladikavkaz vladimir
vladivostok volgograd vologda voronezh vrn vyatka yakutia yamal
yaroslavl yekaterinburg yuzhno-sakhalinsk
""".split()

# .ua: the regional family (oblast names + codes, both spellings)
_UA_GEO = """
cherkassy cherkasy chernigov chernihiv chernivtsi chernovtsy ck cn
cr crimea cv dn dnepropetrovsk dnipropetrovsk donetsk dp if kh
kharkiv kharkov kherson khmelnitskiy khmelnytskyi kiev kirovograd
km kr krym ks kv kyiv lg lt lugansk lutsk lv lviv mk mykolaiv
nikolaev od odesa odessa pl poltava rivne rovno rv sb sebastopol
sevastopol sm sumy te ternopil uz uzhgorod vinnica vinnytsia vn
volyn yalta zaporizhzhe zaporizhzhia zhitomir zhytomyr zp zt
""".split()

# .vn: the 63 province rules (2022 list addition)
_VN_PROVINCES = """
angiang bacgiang backan baclieu bacninh baria-vungtau bentre
binhdinh binhduong binhphuoc binhthuan camau cantho caobang daklak
daknong danang dienbien dongnai dongthap gialai hagiang haiduong
haiphong hanam hanoi hatinh haugiang hoabinh hungyen khanhhoa
kiengiang kontum laichau lamdong langson laocai longan namdinh
nghean ninhbinh ninhthuan phutho phuyen quangbinh quangnam
quangngai quangninh quangtri soctrang sonla tayninh thaibinh
thainguyen thanhhoa thanhphohochiminh thuathienhue tiengiang
travinh tuyenquang vinhlong vinhphuc yenbai
""".split()

# .no: county codes + ASCII municipality names (the published list
# carries every Norwegian municipality; this transcribes the county
# grid and the larger ASCII-named municipalities)
_NO_GEO = """
aa ah bu fm hl hm jan-mayen mr nl nt of ol rl sf st svalbard tm tr
va vf oslo bergen trondheim stavanger tromso drammen kristiansand
fredrikstad sandnes bodo alesund arendal hamar haugesund halden
harstad horten gjovik kongsberg larvik lillehammer molde moss
narvik porsgrunn sarpsborg skien steinkjer sandefjord ski askim
""".split()

# .br: the city-abbreviation grid + professional rules (2018+)
_BR_GEO = """
belem bhz boavista bsb campinas caxias contagem cuiaba curitiba
feira fortal foz goiania gru jab jampa jdf joinville londrina
macapa maceio manaus maringa morena natal niteroi osasco palmas
poa pvh recife rio riobranco riopreto salvador sampa santamaria
santoandre saobernardo sjc slz sorocaba the udi vix
def des det dev enf log rep seg tec
""".split()

# .in: the 2023 registry expansion
_IN_EXTRA = """
5g 6g ai am bihar biz business ca cn com coop cs delhi dr er
gujarat info int internet io me pg post pro travel tv uk up us
""".split()

# private-section hosting roots: the Akamai/Fastly CDN grids, the
# Google hosted-service roots, and more operator-submitted rules
_PRIVATE_R16 = """
akadns.net akamai.net akamai-staging.net akamaiedge.net
akamaiedge-staging.net akamaihd.net akamaihd-staging.net
akamaiorigin.net akamaized.net edgekey.net edgesuite.net
fastlylb.net a.ssl.fastly.net b.ssl.fastly.net
global.ssl.fastly.net a.prod.fastly.net global.prod.fastly.net
googleapis.com googlecode.com withgoogle.com withyoutube.com
cloudfunctions.net run.app myshopify.com weebly.com
000webhostapp.com herokussl.com r2.dev b-cdn.net notion.site
carrd.co framer.app framer.website hatenablog.com hateblo.jp
web.fc2.com co.nl co.no co.ca
""".split()


def _r16_exact() -> set[str]:
    """The r16 extension rules (VERDICT r15 ask 6) as exact-rule
    strings, merged by _build_exact."""
    rules: set[str] = set()
    rules.update(_GTLDS_BRAND_R16, _GTLDS_GENERIC_R16,
                 _GTLDS_GEO_R16, _TLDS_IDN_R16)
    rules.add("post")                    # the UPU legacy TLD
    rules.update(f"{lab}.pl" for lab in _PL_GEO)
    rules.update(f"{lab}.ru" for lab in _RU_GEO)
    rules.update(f"{lab}.ua" for lab in _UA_GEO)
    rules.update(f"{lab}.vn" for lab in _VN_PROVINCES)
    rules.update(f"{lab}.no" for lab in _NO_GEO)
    rules.update(f"{lab}.br" for lab in _BR_GEO)
    rules.update(f"{lab}.in" for lab in _IN_EXTRA)
    # .za / .au / .it stragglers the r15 grid missed
    rules.update(("alt.za", "grondar.za", "ngo.za", "nic.za",
                  "nis.za", "nom.za", "tm.za",
                  "conf.au", "oz.au", "info.au",
                  "edu.it", "gov.it",
                  # the two published k12.ma.us exception-style
                  # 4-label exact rules alongside pvt.k12.ma.us
                  "chtr.k12.ma.us", "paroch.k12.ma.us"))
    rules.update(_PRIVATE_R16)
    return rules


def _build_exact() -> tuple[str, ...]:
    rules: set[str] = set(_TLDS)
    rules.update(_GTLDS_EXTRA, _GTLDS_GEO, _GTLDS_BRAND, _TLDS_IDN)
    for tld, labels in _SECOND_LEVEL.items():
        if tld.endswith("_unused"):
            continue
        for lab in labels.split():
            rules.add(f"{lab}.{tld}")
    for st in _US_STATES:
        rules.add(f"{st}.us")
        for reg in ("k12", "cc", "lib"):
            rules.add(f"{reg}.{st}.us")
    rules.update(f"{lab}.us" for lab in _US_EXTRA)
    # pvt.k12.ma.us: the published list's 4-label exact rule (also
    # the documented depth maximum) — keeps the p4 probe exercised
    rules.add("pvt.k12.ma.us")
    rules.update(f"{lab}.it" for lab in
                 _IT_REGIONS + _IT_PROVINCE_NAMES + _IT_PROVINCE_CODES)
    rules.update(f"{w}.tokyo.jp" for w in _JP_TOKYO_WARDS)
    rules.update(f"blogspot.{cc}" for cc in _BLOGSPOT_CC)
    rules.update(f"{st}.edu.au" for st in _AU_STATES)
    rules.update(f"{st}.gov.au" for st in _AU_STATES)
    rules.update(("nc.tr", "gov.nc.tr", "com.bn", "edu.bn", "gov.bn",
                  "net.bn", "org.bn", "com.cw", "edu.cw", "net.cw",
                  "org.cw", "gov.sx"))
    rules.update(_PRIVATE)
    rules.update(_PRIVATE_EXTRA)
    rules.update(_r16_exact())
    return tuple(sorted(rules))


PSL_EXACT: tuple[str, ...] = _build_exact()

# classic `*.tld` wildcard bases (every 2-label tail under these is a
# public suffix), the Japanese designated-city bases (*.kawasaki.jp
# etc. — every 3-label tail), and the AWS per-instance bases
PSL_WILDCARD: tuple[str, ...] = (
    "bd", "ck", "er", "fk", "jm", "kh", "mm", "np", "pg",
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp",
    # *.sch.uk — the published list wildcards UK schools (r16 fix:
    # previously transcribed as an exact sch.uk rule)
    "sch.uk",
    "compute.amazonaws.com", "compute-1.amazonaws.com",
    "elb.amazonaws.com",
)

# `!` exception rules: carved back out of a wildcard — registrable
PSL_EXCEPTIONS: tuple[str, ...] = (
    "www.ck",
    "city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
    "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
    "city.yokohama.jp",
)


def parse_psl_text(text: str) -> tuple[tuple[str, ...],
                                       tuple[str, ...],
                                       tuple[str, ...]]:
    """Parse the standard publicsuffix.org file format into
    (exact, wildcard_bases, exceptions) — the deployment hook for
    swapping this module's curated snapshot for the full fetched
    list (``// comments``, blank lines, ``*.base`` wildcard rules,
    ``!host`` exception rules; both ICANN and PRIVATE sections are
    kept — section markers are just comments).  Rules are
    lower-cased; non-ASCII (IDN) rules are kept verbatim — hosts
    must be compared in the same form (the PSL file also publishes
    punycode variants).  Wildcard rules always have the shape
    ``*.base`` in the published list; bases up to 3 labels (its
    maximum) are supported by the SQL renderer."""
    exact: list[str] = []
    wild: list[str] = []
    exc: list[str] = []
    for line in text.splitlines():
        rule = line.strip().lower()
        if not rule or rule.startswith("//"):
            continue
        # per spec, anything after whitespace is ignored
        rule = rule.split()[0]
        if rule.startswith("!"):
            rule = rule[1:]
            bucket = exc
        elif rule.startswith("*."):
            rule = rule[2:]
            bucket = wild
        else:
            bucket = exact
        # hostname-charset gate (ADVICE r14): rules are rendered into
        # single-quoted SQL literals downstream; a tampered or
        # corrupted list line carrying a quote/backslash/paren would
        # break (or inject into) the rendered query.  Valid PSL rules
        # are dot-joined labels of [a-z0-9-] or IDN codepoints — a
        # rule outside that charset raises rather than rendering.
        if not _valid_psl_rule(rule):
            raise ValueError(f"PSL rule outside hostname charset: "
                             f"{rule!r}")
        bucket.append(rule)
    return tuple(exact), tuple(wild), tuple(exc)


def _valid_psl_rule(rule: str) -> bool:
    """True iff every char is hostname-legal: ASCII letter/digit/
    hyphen/dot, or a non-ASCII (IDN) codepoint — the published list
    carries IDN rules verbatim alongside their punycode twins.  In
    particular quotes, backslashes, and parens are rejected, so a
    rule can always be rendered inside a single-quoted SQL literal
    unescaped."""
    return bool(rule) and all(
        c.isalnum() or c in "-." or ord(c) > 127 for c in rule)


def load_psl_file(path: str) -> tuple[tuple[str, ...],
                                      tuple[str, ...],
                                      tuple[str, ...]]:
    """Read a fetched public_suffix_list.dat; see parse_psl_text."""
    with open(path, encoding="utf-8") as f:
        return parse_psl_text(f.read())


def psl_values_sql(exact: tuple[str, ...] = None) -> str:
    """The exact rules as an inline VALUES relation (engine-shared
    text; DuckDB constant table / Spark LocalRelation -> broadcast).

    An explicitly-empty ``exact`` renders a single never-matching
    sentinel row (``'!'`` is hostname-illegal and dot-free, so it can
    never equal a 2+-label tail) — consistent with the
    ``is not None`` override semantics of the other rule sets
    (ADVICE r14).  Rules are charset-gated before rendering: anything
    that could not sit inside a single-quoted SQL literal raises."""
    rules = exact if exact is not None else PSL_EXACT
    for s in rules:
        if not _valid_psl_rule(s):
            raise ValueError(f"PSL rule outside hostname charset: "
                             f"{s!r}")
    rows = ", ".join(f"('{s}')" for s in rules) or "('!')"
    return f"(VALUES {rows}) AS psl(suffix)"


# candidate k-label tails of a host (anchored regexes; k labels)
_TAIL = {
    1: r"([^.]+)$",
    2: r"([^.]+\.[^.]+)$",
    3: r"([^.]+\.[^.]+\.[^.]+)$",
    4: r"([^.]+\.[^.]+\.[^.]+\.[^.]+)$",
    5: r"([^.]+\.[^.]+\.[^.]+\.[^.]+\.[^.]+)$",
}


def reg_domain_ctes(src: str,
                    exact: tuple[str, ...] = None,
                    wildcards: tuple[str, ...] = None,
                    exceptions: tuple[str, ...] = None) -> str:
    """CTE text computing ``reg_domain`` for every row of ``src``
    (which must expose ``host`` plus pass-through columns handled by
    the caller's SELECT).  Emits two CTEs, ``_psl_tails`` and
    ``_psl_hit``; the caller selects from ``_psl_hit``.

    PSL algorithm, rendered relationally: take the 2/3/4-label tails
    of the host, LEFT JOIN each against the exact-rule relation
    (broadcast-sized), apply the wildcard/exception rules inline
    (tiny literal lists), pick the LONGEST match, and emit one label
    more than the winning suffix.  Unlisted TLDs fall back to the
    default rule (suffix = last label -> registered domain = last
    two labels).  A host that IS a public suffix (or a single
    label) degrades to itself — never NULL, never an error.

    ``exact``/``wildcards``/``exceptions`` override the embedded
    snapshot — pass load_psl_file(...) output to run against the
    full fetched list.  Wildcard bases of 1-3 labels are supported
    (the published list's maximum is 3, e.g.
    ``*.compute.amazonaws.com``); exact rules are matched up to 4
    labels (the published maximum, e.g. ``pvt.k12.ma.us``).  A rule
    outside those bounds raises at render time rather than silently
    mis-deriving."""
    wild_all = wildcards if wildcards is not None else PSL_WILDCARD
    exc_all = exceptions if exceptions is not None else PSL_EXCEPTIONS
    ex_rules = exact if exact is not None else PSL_EXACT
    for r in ex_rules:
        if r.count(".") > 3:
            raise ValueError(f"exact PSL rule too deep (>4 labels): {r}")
    for w in wild_all:
        if w.count(".") > 2:
            raise ValueError(f"wildcard PSL base too deep (>3 labels): {w}")
    # wildcard bases grouped by label count; a base of k labels makes
    # every (k+1)-label tail a public suffix unless excepted
    def _in_list(expr: str, items: list[str]) -> str:
        if not items:
            return "FALSE"
        for w in items:
            if not _valid_psl_rule(w):
                raise ValueError(f"PSL rule outside hostname charset: "
                                 f"{w!r}")
        lits = ", ".join(f"'{w}'" for w in items)
        return f"{expr} IN ({lits})"
    w1 = [w for w in wild_all if w.count(".") == 0]
    w2 = [w for w in wild_all if w.count(".") == 1]
    w3 = [w for w in wild_all if w.count(".") == 2]
    exc_l = list(exc_all)
    # LABEL-COUNT SPLIT (VERDICT r14 ask 2 trim): a k-label tail can
    # only ever equal a k-label rule, so each probe joins ONLY its
    # own label-count bucket instead of the full relation — 1-label
    # TLD rules (matchable by no tail; the default rule covers them)
    # are rendered nowhere, and an empty bucket renders NO join at
    # all (its hit condition folds to FALSE).  Total broadcast rows
    # drop from 3x|rules| to ~|rules needing a join|.  The p4 bucket
    # currently holds the handful of published 4-label rules (the
    # k12.ma.us trio, the ssl/prod fastly.net grid — ADVICE r15
    # fixed this comment's earlier claim that it was empty), so the
    # p4 join renders small; it vanishes only when the bucket is
    # empty.
    ex_by_k = {k: tuple(s for s in ex_rules if s.count(".") == k - 1)
               for k in (2, 3, 4)}
    joins = []
    hit = {}
    for k in (2, 3, 4):
        if ex_by_k[k]:
            rel = psl_values_sql(ex_by_k[k]).replace("psl(", f"p{k}(")
            joins.append(f"LEFT JOIN {rel}\n"
                         f"               ON p{k}.suffix = "
                         f"_psl_tails.t{k}")
            hit[k] = f"p{k}.suffix IS NOT NULL"
        else:
            hit[k] = "FALSE"
    join_sql = "\n        ".join(joins)
    # parent(tK) = tK minus its first label — the K-1-label base a
    # wildcard rule would name
    par3 = r"regexp_extract(t3, '^[^.]+\.(.+)$', 1)"
    par4 = r"regexp_extract(t4, '^[^.]+\.(.+)$', 1)"
    return f"""_psl_tails AS (
        SELECT *,
               regexp_extract(host, '{_TAIL[1]}', 1) AS t1,
               regexp_extract(host, '{_TAIL[2]}', 1) AS t2,
               regexp_extract(host, '{_TAIL[3]}', 1) AS t3,
               regexp_extract(host, '{_TAIL[4]}', 1) AS t4
        FROM {src}
    ), _psl_hit AS (
        SELECT _psl_tails.*,
               CASE WHEN {_in_list(par4, w3)} THEN
                        CASE WHEN {_in_list('t4', exc_l)} THEN 3
                             ELSE 4 END
                    WHEN {hit[4]} THEN 4
                    WHEN {_in_list(par3, w2)} THEN
                        CASE WHEN {_in_list('t3', exc_l)} THEN 2
                             ELSE 3 END
                    WHEN {hit[3]} THEN 3
                    WHEN {_in_list('t1', w1)} AND t2 <> '' THEN
                        CASE WHEN {_in_list('t2', exc_l)} THEN 1
                             ELSE 2 END
                    WHEN {hit[2]} THEN 2
                    ELSE 1 END AS _psl_klen
        FROM _psl_tails
        {join_sql}
    )"""


def registered_domain_py(host: str,
                         exact: tuple[str, ...] = None,
                         wildcards: tuple[str, ...] = None,
                         exceptions: tuple[str, ...] = None) -> str:
    """Pure-Python reference implementation of the PSL algorithm with
    the SAME degrade semantics as the SQL rendering — the
    differential oracle for mass host testing (SQL and Python are
    written independently from the published algorithm; a bug in the
    relational rendering shows as a mismatch).

    Rules: exception rules win outright (the excepted domain is
    itself registrable); otherwise the longest matching rule wins,
    where a wildcard ``*.base`` matches any tail of len(base)+1
    labels; unlisted TLDs take the default ``*`` rule (last label).
    Registered domain = suffix plus one label, degrading to the host
    when no extra label exists."""
    ex = set(exact if exact is not None else PSL_EXACT)
    wd = set(wildcards if wildcards is not None else PSL_WILDCARD)
    xc = set(exceptions if exceptions is not None else PSL_EXCEPTIONS)
    labels = host.split(".")
    # the SQL tails are END-anchored runs of non-empty labels, so a
    # malformed host participates only through its longest run of
    # TRAILING non-empty labels ('.example.com' -> example.com;
    # 'a..b' / 'example.com.' -> no usable tail -> the host itself);
    # mirror that exactly
    m = 0
    for lab in reversed(labels):
        if not lab:
            break
        m += 1
    if m == 0:
        return host
    eff = labels[-m:]
    best = 1                                   # the default '*' rule
    for k in range(1, m + 1):
        tail = ".".join(eff[-k:])
        parent = ".".join(eff[-(k - 1):]) if k > 1 else ""
        if tail in xc and parent in wd:
            # exception: the tail is registrable, suffix = its parent
            best = max(best, k - 1)
        elif tail in ex:
            best = max(best, k)
        elif k > 1 and parent in wd and tail not in xc:
            best = max(best, k)
    if m < 2:
        return host             # no 2-label tail to emit
    # the SQL reg expression CASCADES to the largest non-empty tail
    # (a suffix-only or leading-dot host emits its m-label tail)
    return ".".join(eff[-min(best + 1, m):])


def with_registered_domain(df, host_col: str = "host",
                           out_col: str = "reg_domain",
                           exact: tuple[str, ...] = None,
                           wildcards: tuple[str, ...] = None,
                           exceptions: tuple[str, ...] = None):
    """Column-API twin of the SQL rendering for DataFrames that are
    not built from SQL templates — in particular STREAMING frames,
    where the PSL relation joins as a stream-static BROADCAST join
    (fully supported by Structured Streaming; the static side is a
    LocalRelation).  Appends ``out_col``; the helper columns are
    dropped.  Patterns are plain Python strings through the Column
    API, so no parser-mode conf is ever touched (the streaming-path
    requirement — see warc_documents_projection).

    Same bounds as reg_domain_ctes: exact rules to 4 labels,
    wildcard bases to 3."""
    from pyspark.sql import functions as F

    ex_rules = exact if exact is not None else PSL_EXACT
    wild_all = wildcards if wildcards is not None else PSL_WILDCARD
    exc_all = list(exceptions if exceptions is not None
                   else PSL_EXCEPTIONS)
    for r in ex_rules:
        if r.count(".") > 3:
            raise ValueError(f"exact PSL rule too deep (>4 labels): {r}")
    for w in wild_all:
        if w.count(".") > 2:
            raise ValueError(f"wildcard PSL base too deep (>3 labels): {w}")
    spark = df.sparkSession
    host = F.col(host_col)

    def tail(k: int) -> "F.Column":
        return F.regexp_extract(host, _TAIL[k], 1)

    def isin(col, items) -> "F.Column":
        return col.isin(*items) if items else F.lit(False)

    w1 = [w for w in wild_all if w.count(".") == 0]
    w2 = [w for w in wild_all if w.count(".") == 1]
    w3 = [w for w in wild_all if w.count(".") == 2]
    d = df
    hits = {}
    for k in (2, 3, 4):
        pk = f"_psl_p{k}"
        rules_k = sorted({s for s in ex_rules if s.count(".") == k - 1})
        rel = spark.createDataFrame([(s,) for s in rules_k] or
                                    [("\x00never",)], f"{pk} string")
        d = d.join(F.broadcast(rel), tail(k) == F.col(pk), "left")
        hits[k] = F.col(pk).isNotNull()
    par3 = F.regexp_extract(tail(3), r"^[^.]+\.(.+)$", 1)
    par4 = F.regexp_extract(tail(4), r"^[^.]+\.(.+)$", 1)
    klen = (
        F.when(isin(par4, w3),
               F.when(isin(tail(4), exc_all), F.lit(3)).otherwise(4))
        .when(hits[4], F.lit(4))
        .when(isin(par3, w2),
              F.when(isin(tail(3), exc_all), F.lit(2)).otherwise(3))
        .when(hits[3], F.lit(3))
        .when(isin(tail(1), w1) & (tail(2) != ""),
              F.when(isin(tail(2), exc_all), F.lit(1)).otherwise(2))
        .when(hits[2], F.lit(2))
        .otherwise(F.lit(1)))
    d = d.withColumn("_psl_klen", klen)
    reg = (
        F.when((F.col("_psl_klen") == 4) & (tail(5) != ""), tail(5))
        .when((F.col("_psl_klen") >= 3) & (tail(4) != ""), tail(4))
        .when((F.col("_psl_klen") >= 2) & (tail(3) != ""), tail(3))
        .when(tail(2) != "", tail(2))
        .otherwise(host))
    return (d.withColumn(out_col, reg)
            .drop("_psl_p2", "_psl_p3", "_psl_p4", "_psl_klen"))


def reg_domain_expr() -> str:
    """The registered-domain expression over a ``_psl_hit`` row:
    one label more than the winning suffix, degrading to the host
    itself when the host has no extra label."""
    return f"""CASE
        WHEN _psl_klen = 4 AND
             regexp_extract(host, '{_TAIL[5]}', 1) <> ''
             THEN regexp_extract(host, '{_TAIL[5]}', 1)
        WHEN _psl_klen >= 3 AND
             regexp_extract(host, '{_TAIL[4]}', 1) <> ''
             THEN regexp_extract(host, '{_TAIL[4]}', 1)
        WHEN _psl_klen >= 2 AND
             regexp_extract(host, '{_TAIL[3]}', 1) <> ''
             THEN regexp_extract(host, '{_TAIL[3]}', 1)
        WHEN regexp_extract(host, '{_TAIL[2]}', 1) <> ''
             THEN regexp_extract(host, '{_TAIL[2]}', 1)
        ELSE host END"""
