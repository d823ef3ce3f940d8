"""Trimmed public-suffix snapshot + assignment-level domain reduction.

The reference delegates to ``PublicSuffixes.reduceSurtToAssignmentLevel``
(webarchive-commons), which embeds the full publicsuffix.org list. This
module carries a TRIMMED snapshot of that PUBLIC data — the widely-used
multi-label registry suffixes plus the common private-section hosting
suffixes — enough to make the assignable-domain law correct for the
dominant ccTLD registries (co.uk, com.au, co.jp, ...). Single-label TLDs
need no table (the default is suffix length 1). Swap in the full list at
deployment by extending these sets; the reduction law is unchanged.

Used by AssignmentLevelSurtQueueAssignmentPolicy
(engine/.../frontier/AssignmentLevelSurtQueueAssignmentPolicy.java:36-64)
and HopCrossesAssignmentLevelDomainDecideRule.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: multi-label PUBLIC suffixes, dot form (registry section, trimmed)
_REGISTRY_2LABEL = """
co.uk org.uk me.uk ltd.uk plc.uk net.uk sch.uk ac.uk gov.uk nhs.uk mod.uk
co.jp ne.jp or.jp ac.jp ad.jp ed.jp go.jp gr.jp lg.jp
com.au net.au org.au edu.au gov.au asn.au id.au
co.nz net.nz org.nz govt.nz ac.nz geek.nz gen.nz school.nz
co.za net.za org.za web.za gov.za ac.za
com.br net.br org.br gov.br edu.br
com.cn net.cn org.cn gov.cn edu.cn ac.cn
com.mx org.mx net.mx gob.mx edu.mx
com.ar net.ar org.ar gob.ar edu.ar
com.tr net.tr org.tr gov.tr edu.tr
co.in net.in org.in firm.in gen.in ind.in ac.in edu.in gov.in res.in
co.kr ne.kr or.kr re.kr go.kr ac.kr pe.kr
com.sg net.sg org.sg edu.sg gov.sg per.sg
com.hk net.hk org.hk edu.hk gov.hk idv.hk
com.tw net.tw org.tw edu.tw gov.tw idv.tw
co.th in.th ac.th go.th net.th or.th
com.my net.my org.my edu.my gov.my
com.ph net.ph org.ph
com.vn net.vn org.vn edu.vn gov.vn
co.id or.id ac.id go.id web.id
com.eg net.eg org.eg edu.eg gov.eg
com.sa net.sa org.sa edu.sa gov.sa med.sa pub.sa sch.sa
co.il org.il net.il ac.il gov.il muni.il k12.il
com.pk net.pk org.pk edu.pk gov.pk
com.ng net.ng org.ng edu.ng gov.ng
co.ke ne.ke or.ke ac.ke go.ke sc.ke
com.ua net.ua org.ua edu.ua gov.ua in.ua
com.pl net.pl org.pl edu.pl gov.pl waw.pl
co.at or.at ac.at gv.at priv.at
com.es nom.es org.es gob.es edu.es
com.pt net.pt org.pt edu.pt gov.pt publ.pt
com.gr net.gr org.gr edu.gr gov.gr
com.co net.co org.co edu.co gov.co nom.co mil.co
com.ve net.ve org.ve
com.pe net.pe org.pe edu.pe gob.pe nom.pe mil.pe
com.ec com.uy com.bo com.py com.do com.gt com.sv com.ni com.hn com.pa
co.cr com.bd net.bd org.bd edu.bd gov.bd
com.np com.lk com.kh com.mm
co.tz ac.tz or.tz go.tz ne.tz sc.tz
co.ug ac.ug or.ug go.ug ne.ug sc.ug
co.zw ac.zw org.zw gov.zw
com.gh edu.gh org.gh gov.gh
co.ma net.ma org.ma ac.ma gov.ma press.ma
com.tn com.jo com.lb com.kw com.qa com.bh com.om
ac.ae co.ae net.ae org.ae gov.ae sch.ae
com.af co.ir ac.ir gov.ir id.ir net.ir org.ir sch.ir
com.iq com.sy com.ye co.uz com.uz
com.kz org.kz edu.kz gov.kz
com.kg org.kg net.kg com.tj com.tm
com.mn org.mn edu.mn gov.mn
com.la com.mo net.mo org.mo edu.mo gov.mo
com.mt org.mt net.mt edu.mt gov.mt
com.cy com.mk org.mk net.mk edu.mk gov.mk
com.al org.al net.al edu.al gov.al
com.ba org.ba net.ba edu.ba gov.ba
co.rs org.rs edu.rs in.rs ac.rs gov.rs
com.hr com.ro org.ro
"""

#: common PRIVATE-section hosting suffixes (each customer site is its own
#: assignable domain — exactly why Heritrix uses the full list with the
#: private section included)
_PRIVATE_2LABEL = """
github.io gitlab.io blogspot.com herokuapp.com appspot.com cloudfront.net
azurewebsites.net netlify.app vercel.app web.app firebaseapp.com
wordpress.com tumblr.com weebly.com wixsite.com neocities.org
"""

_3LABEL = """
s3.amazonaws.com compute.amazonaws.com elb.amazonaws.com
"""

MULTI2: frozenset[str] = frozenset((_REGISTRY_2LABEL + _PRIVATE_2LABEL).split())
MULTI3: frozenset[str] = frozenset(_3LABEL.split())


def suffix_length(host: str) -> int:
    """Public-suffix label count for ``host`` (1 unless in the snapshot)."""
    labels = host.lower().split(".")
    if len(labels) >= 3 and ".".join(labels[-3:]) in MULTI3:
        return 3
    if len(labels) >= 2 and ".".join(labels[-2:]) in MULTI2:
        return 2
    return 1


def assignment_level_domain(host: str) -> str:
    """publicsuffix-plus-one domain of ``host`` (dot form).

    A host that IS a bare public suffix is returned unchanged (the
    reference's reduce keeps un-reducible prefixes intact)."""
    labels = host.lower().split(".")
    take = min(len(labels), suffix_length(host) + 1)
    return ".".join(labels[-take:])


def reduce_surt_to_assignment_level(surt_auth: str) -> str:
    """PublicSuffixes.reduceSurtToAssignmentLevel on a SURT authority
    (reversed comma-joined labels, trailing comma): 'uk,co,bbc,www,' ->
    'uk,co,bbc,'."""
    labels = [x for x in surt_auth.split(",") if x]
    if not labels:
        return surt_auth
    host = ".".join(reversed(labels))
    take = min(len(labels), suffix_length(host) + 1)
    return ",".join(labels[:take]) + ","


# ---------------------------------------------------------------------------
# Column forms — set probes compile to Catalyst InSet (hash set, O(1)/row)
# ---------------------------------------------------------------------------
def suffix_take_col(labels: Column) -> Column:
    """Labels to KEEP (suffix+1) given a host label array (dot order)."""
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-2)), F.try_element_at(labels, F.lit(-1))
    )
    last3 = F.concat_ws(
        ".",
        F.try_element_at(labels, F.lit(-3)),
        F.try_element_at(labels, F.lit(-2)),
        F.try_element_at(labels, F.lit(-1)),
    )
    return (
        F.when((n >= 4) & last3.isin(*sorted(MULTI3)), F.lit(4))
        # a host that IS a bare 3-label suffix stays whole
        .when((n == 3) & last3.isin(*sorted(MULTI3)), F.lit(3))
        .when((n >= 3) & last2.isin(*sorted(MULTI2)), F.lit(3))
        .otherwise(F.least(n, F.lit(2)))
    )


def assignment_level_domain_col(host: Column) -> Column:
    """Column form of :func:`assignment_level_domain`."""
    labels = F.split(F.lower(host), r"\.")
    take = suffix_take_col(labels)
    return F.array_join(
        F.reverse(F.slice(F.reverse(labels), 1, take.cast("int"))), "."
    )
