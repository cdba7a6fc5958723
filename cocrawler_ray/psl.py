"""Public Suffix List (PSL) rules + vectorized registrable-domain
(eTLD+1) extraction.

Reference parity: ``cocrawler/urls.py::URL`` computes
``registered_domain`` via tldextract, which is a PSL lookup. This module
embeds a snapshot of the Mozilla Public Suffix List (publicsuffix.org —
public, CC-BY-SA data) and implements the published PSL algorithm:

1. a host is matched against all rules; a rule matches when its labels
   equal the host's trailing labels, with ``*`` matching exactly one
   label;
2. if any EXCEPTION rule (``!`` prefix) matches, it prevails and the
   public suffix is the exception rule minus its leftmost label;
3. otherwise the prevailing rule is the matching rule with the most
   labels (the implicit default rule ``*`` makes every bare TLD a
   public suffix);
4. the registrable domain is the public suffix plus one preceding label.

Hosts that ARE a public suffix (or have fewer labels) return themselves
unchanged — the same grouping-key behavior the crawl loop has always
used (politeness buckets never get an empty key).

The snapshot below is a curated SUBSET of the full list (the complete
file is ~10k rules): every rule style (exact multi-label, wildcard,
exception), the high-traffic ccTLD registries a broad crawl actually
hits, the systematic ``us`` state tree (generated), and the common
hosting suffixes from the PRIVATE section (tldextract's default
includes them; ``include_private=False`` restricts matching to the
ICANN section). Swap ``ICANN_RULES``/``PRIVATE_RULES`` for a full
``public_suffix_list.dat`` parse outside the sandbox — the matcher is
list-size-independent.

Scale shape: pure per-batch numpy (rpartition chains + np.isin against
sorted rule arrays) — no per-row Python, no state, safe inside any
``map_batches``.
"""

from __future__ import annotations

import numpy as np

# --- ICANN section (curated snapshot; format identical to the PSL file)

_US_STATES = (
    "al ak az ar ca co ct de dc fl ga hi id il in ia ks ky la me md ma mi "
    "mn ms mo mt ne nv nh nj nm ny nc nd oh ok or pa ri sc sd tn tx ut vt "
    "va wa wv wi wy as gu pr vi").split()

ICANN_RULES: tuple[str, ...] = tuple(
    # United Kingdom
    "co.uk org.uk me.uk ltd.uk plc.uk net.uk sch.uk ac.uk gov.uk nhs.uk "
    "police.uk "
    # Australia
    "com.au net.au org.au edu.au gov.au asn.au id.au "
    "act.au nsw.au nt.au qld.au sa.au tas.au vic.au wa.au "
    # Japan (registry second-levels + the city wildcards/exceptions)
    "ac.jp ad.jp co.jp ed.jp go.jp gr.jp lg.jp ne.jp or.jp "
    "tokyo.jp osaka.jp kyoto.jp hokkaido.jp okinawa.jp fukuoka.jp "
    "aichi.jp kanagawa.jp saitama.jp chiba.jp hyogo.jp "
    "*.kawasaki.jp *.kitakyushu.jp *.kobe.jp *.nagoya.jp *.sapporo.jp "
    "*.sendai.jp *.yokohama.jp "
    "!city.kawasaki.jp !city.kitakyushu.jp !city.kobe.jp !city.nagoya.jp "
    "!city.sapporo.jp !city.sendai.jp !city.yokohama.jp "
    # New Zealand
    "co.nz net.nz org.nz govt.nz ac.nz school.nz geek.nz gen.nz kiwi.nz "
    "maori.nz iwi.nz health.nz mil.nz parliament.nz cri.nz "
    # South Africa
    "ac.za co.za edu.za gov.za law.za mil.za net.za ngo.za nom.za org.za "
    "school.za web.za "
    # Brazil (common registry second-levels)
    "com.br net.br org.br gov.br edu.br mil.br art.br adv.br blog.br "
    "eco.br emp.br eng.br esp.br far.br flog.br ind.br inf.br jus.br "
    "leg.br med.br mp.br mus.br "
    # India
    "co.in net.in org.in firm.in gen.in ind.in ac.in edu.in res.in "
    "gov.in mil.in nic.in "
    # China (registry + province second-levels)
    "com.cn net.cn org.cn gov.cn edu.cn ac.cn mil.cn "
    "bj.cn sh.cn tj.cn cq.cn gd.cn zj.cn js.cn sd.cn fj.cn hn.cn "
    # South Korea
    "co.kr ne.kr or.kr re.kr pe.kr go.kr mil.kr ac.kr hs.kr ms.kr es.kr "
    "sc.kr kg.kr seoul.kr busan.kr daegu.kr incheon.kr "
    # Mexico / Argentina / Colombia / Chile / Peru / Venezuela
    "com.mx org.mx net.mx gob.mx edu.mx "
    "com.ar net.ar org.ar gob.ar edu.ar int.ar mil.ar musica.ar tur.ar "
    "com.co net.co org.co edu.co gov.co mil.co nom.co "
    "gob.cl gov.cl mil.cl "
    "com.pe net.pe org.pe gob.pe edu.pe mil.pe nom.pe "
    "com.ve net.ve org.ve gob.ve edu.ve mil.ve "
    # Turkey / Israel / Russia-adjacent
    "com.tr net.tr org.tr gov.tr edu.tr mil.tr bel.tr pol.tr k12.tr "
    "av.tr dr.tr "
    "co.il org.il net.il ac.il gov.il muni.il idf.il k12.il "
    "com.ru net.ru org.ru msk.ru spb.ru "
    "com.ua net.ua org.ua edu.ua gov.ua in.ua kiev.ua "
    # South-East Asia
    "com.sg edu.sg gov.sg net.sg org.sg per.sg "
    "com.hk edu.hk gov.hk idv.hk net.hk org.hk "
    "com.tw net.tw org.tw edu.tw gov.tw idv.tw club.tw game.tw ebiz.tw "
    "co.th ac.th go.th in.th mi.th net.th or.th "
    "com.my net.my org.my gov.my edu.my mil.my name.my "
    "com.ph net.ph org.ph gov.ph edu.ph ngo.ph i.ph "
    "com.vn net.vn org.vn edu.vn gov.vn int.vn ac.vn biz.vn info.vn "
    "name.vn pro.vn health.vn "
    "co.id web.id my.id or.id ac.id sch.id go.id mil.id net.id biz.id "
    "desa.id ponpes.id "
    # Middle East / Africa
    "com.eg net.eg org.eg gov.eg edu.eg sci.eg eun.eg mil.eg name.eg "
    "com.sa net.sa org.sa gov.sa edu.sa med.sa pub.sa sch.sa "
    "com.ng edu.ng gov.ng net.ng org.ng name.ng sch.ng mil.ng mobi.ng "
    "co.ke or.ke ne.ke go.ke ac.ke sc.ke me.ke mobi.ke info.ke "
    "com.pk net.pk edu.pk org.pk fam.pk biz.pk web.pk gov.pk gob.pk "
    "gok.pk gon.pk gop.pk gos.pk "
    "co.tz ac.tz go.tz or.tz ne.tz sc.tz "
    "com.gh edu.gh gov.gh org.gh mil.gh "
    # Europe second-levels
    "co.at or.at ac.at gv.at priv.at "
    "com.pl net.pl org.pl edu.pl gov.pl mil.pl waw.pl "
    "com.pt net.pt org.pt edu.pt gov.pt int.pt publ.pt "
    "com.gr net.gr org.gr edu.gr gov.gr "
    "com.ro org.ro tm.ro nt.ro nom.ro info.ro rec.ro arts.ro firm.ro "
    "store.ro www.ro "
    "co.hu org.hu info.hu priv.hu sport.hu tm.hu 2000.hu bolt.hu "
    "city.hu film.hu news.hu "
    "ac.be "
    "asso.fr com.fr gouv.fr nom.fr prd.fr tm.fr avocat.fr aeroport.fr "
    "co.it edu.it gov.it "
    "co.no priv.no "
    # wildcard-registry ccTLDs (every second level is a registry) + the
    # canonical exception
    "*.bd *.ck !www.ck *.er *.fk *.jm *.kh *.mm *.np *.pg *.ye "
    # misc common
    "co.com us.com eu.com uk.com de.com gb.net hu.net jp.net se.net "
    "uk.net co.cc co.ca".split()
    # systematic US state tree: <st>.us plus the k12/cc/lib third levels
    + [f"{st}.us" for st in _US_STATES]
    + [f"{kind}.{st}.us" for st in _US_STATES
       for kind in ("k12", "cc", "lib")]
)

# --- PRIVATE section (hosting platforms; tldextract includes these by
# default, so the reference's registered_domain did too)

PRIVATE_RULES: tuple[str, ...] = tuple(
    "github.io githubusercontent.com gitlab.io blogspot.com "
    "wordpress.com tumblr.com herokuapp.com netlify.app vercel.app "
    "web.app firebaseapp.com appspot.com azurewebsites.net "
    "cloudfront.net elasticbeanstalk.com s3.amazonaws.com "
    "compute.amazonaws.com pages.dev workers.dev readthedocs.io "
    "surge.sh onrender.com fly.dev hf.space neocities.org "
    "fastlylb.net glitch.me repl.co dyndns.org no-ip.com "
    "duckdns.org ngrok.io".split()
)

_MAX_RULE_LABELS = 4  # longest embedded rule (k12.<st>.us / !city.*.jp)


def _compile(rules: tuple[str, ...]):
    """Split rules into per-label-count lookup arrays:
    exact[k] — k-label exact rules; wild_base[k] — the base (non-star
    part, k labels) of ``*.base`` rules, matching any (k+1)-label
    suffix; exc[k] — k-label exception rules."""
    exact: dict[int, list] = {}
    wild: dict[int, list] = {}
    exc: dict[int, list] = {}
    for r in rules:
        if r.startswith("!"):
            body = r[1:]
            exc.setdefault(body.count(".") + 1, []).append(body)
        elif r.startswith("*."):
            base = r[2:]
            wild.setdefault(base.count(".") + 1, []).append(base)
        else:
            exact.setdefault(r.count(".") + 1, []).append(r)
    as_np = lambda d: {k: np.sort(np.asarray(v, dtype=str))
                       for k, v in d.items()}
    return as_np(exact), as_np(wild), as_np(exc)


_ICANN = _compile(ICANN_RULES)
_FULL = _compile(ICANN_RULES + PRIVATE_RULES)


def _suffix_arrays(h: np.ndarray, max_k: int):
    """last-k-label suffix strings for k = 1..max_k (vectorized
    rpartition chain). suf[k] is only meaningful where the host has
    >= k labels."""
    suf: dict[int, np.ndarray] = {}
    rest = h
    for k in range(1, max_k + 1):
        rest, _, lab = np.char.rpartition(rest, ".").T
        suf[k] = lab if k == 1 else np.char.add(
            np.char.add(lab, "."), suf[k - 1])
    return suf


def public_suffix_len_batch(hosts, include_private: bool = True
                            ) -> np.ndarray:
    """Label count of each host's public suffix under the PSL
    algorithm (>= 1: the implicit ``*`` default rule)."""
    h = np.asarray(hosts, dtype=str)
    exact, wild, exc = _FULL if include_private else _ICANN
    n_lab = np.char.count(h, ".") + 1
    suf = _suffix_arrays(h, _MAX_RULE_LABELS)
    ps = np.ones(len(h), dtype=np.int64)
    for k, arr in exact.items():
        if k < 2:
            continue  # 1-label exact rules == the default rule
        m = (n_lab >= k) & np.isin(suf[k], arr)
        ps = np.where(m & (k > ps), k, ps)
    for kb, arr in wild.items():
        k = kb + 1  # *.base matches one label more than the base
        if k > _MAX_RULE_LABELS:
            continue
        m = (n_lab >= k) & np.isin(suf[kb], arr)
        ps = np.where(m & (k > ps), k, ps)
    # exceptions prevail over everything: suffix = rule minus left label
    for k, arr in exc.items():
        m = (n_lab >= k) & np.isin(suf[k], arr)
        ps = np.where(m, k - 1, ps)
    return ps


def registrable_domain_batch(hosts, include_private: bool = True
                             ) -> np.ndarray:
    """Registrable domain (PLD / eTLD+1) per host — public suffix plus
    one label; hosts at or below the suffix return themselves."""
    h = np.asarray(hosts, dtype=str)
    if not len(h):
        return h
    ps = public_suffix_len_batch(h, include_private)
    reg = ps + 1
    suf = _suffix_arrays(h, _MAX_RULE_LABELS + 1)
    n_lab = np.char.count(h, ".") + 1
    out = h.copy()
    for k in range(2, _MAX_RULE_LABELS + 2):
        sel = (reg == k) & (n_lab > k - 1)
        if sel.any():
            out[sel] = np.where(n_lab[sel] == k, h[sel], suf[k][sel])
    return out
