"""N15 — thesis emitter (SURVEY §2.6).

Reference: /root/reference/modules/research_info.py — thesis_infos dict
(:1621-1631), date parse F16 (:1784-1825), build_thesis_nodes (:1828-1912),
add_thesis_info_to_first_contributon (:1913-1960).

work#dissertation a bf:Dissertation — only for thesis records (BE=SH or
DT/DT2=61); degree from GRAD, date from PD→PROMY (the reference's PY arm
is unreachable)
via bf:dissertation; HRF → #thesis_advisor a bf:Contribution+bf:ThesisAdvisory
(role relators:ths, https scheme — the reference mixes http/https schemes per
module and we mirror it); KRF → #thesis_reviewer_{n} (role dgc; only emitted
when an advisor exists — reference indentation quirk, mirrored); dissertant
role (dis) on the first person contribution + the INST institute as its
affiliation when it has none.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from psyndex2linkeddata_spark import namespaces as NS
from psyndex2linkeddata_spark.emit.base import T, cleaned, frag, pack, subfrag, typ
from psyndex2linkeddata_spark.emit.contributions import _affiliation_triples
from psyndex2linkeddata_spark.functions.cleaning import nullif_empty
from psyndex2linkeddata_spark.functions.dates import date_or_year
from psyndex2linkeddata_spark.functions.names import family_name, given_name

def W():
    return F.col("work")

HTTPS_RELATORS = "https://id.loc.gov/vocabulary/relators/"


def _person_contribution(
    node: Column, extra_class: str, name: Column, role: str
) -> list[Column]:
    person = subfrag(node, "person")
    fam = family_name(name)
    giv = given_name(name)
    return [
        typ(node, NS.BF + "Contribution"),
        typ(node, NS.BF + extra_class),
        T(W(), NS.BF + "contribution", node, iri=True),
        typ(person, NS.BF + "Person"),
        T(node, NS.BF + "agent", person, iri=True),
        T(person, NS.SCHEMA + "familyName", fam),
        T(person, NS.SCHEMA + "givenName", F.coalesce(giv, F.lit(""))),
        T(node, NS.BF + "role", HTTPS_RELATORS + role, iri=True),
    ]


def thesis() -> Column:
    # Only thesis records get a dissertation node: BE == "SH" or DT/DT2 ==
    # "61" (reference get_thesis_info, research_info.py:1649 — GRAD/PD are
    # extracted inside that branch only, so a non-thesis record's PY never
    # becomes a degree date).
    is_thesis = (
        (F.coalesce(F.col("BE"), F.lit("")) == "SH")
        | (F.coalesce(F.col("DT"), F.lit("")) == "61")
        | (F.coalesce(F.col("DT2"), F.lit("")) == "61")
    )
    degree = cleaned(nullif_empty(F.col("GRAD")))
    # PD→PROMY only: the reference's PY fallback (research_info.py:1815)
    # is unreachable — the PROMY branch cannot raise — so a thesis with
    # neither PD nor PROMY gets no date.
    d = date_or_year(F.col("PD"), F.col("PROMY"))
    has_core = is_thesis & (degree.isNotNull() | d["value"].isNotNull())
    diss = frag(W(), "dissertation")

    core = pack(
        typ(diss, NS.BF + "Dissertation"),
        T(W(), NS.BF + "dissertation", diss, iri=True),
        T(diss, NS.BF + "degree", degree),
        T(diss, NS.BF + "date", d["value"]),
        when=has_core,
    )

    advisor_name = cleaned(
        F.when(
            F.size(F.coalesce(F.col("HRF"), F.array())) > 0,
            F.element_at(F.col("HRF"), 1),
        )
    )
    advisor_node = frag(W(), "thesis_advisor")
    advisor = pack(
        *_person_contribution(advisor_node, "ThesisAdvisory", advisor_name, "ths"),
        when=has_core & advisor_name.isNotNull(),
    )

    def one_reviewer(s: Column, i: Column) -> Column:
        node = F.concat(W(), F.lit("#thesis_reviewer_"), (i + 1).cast("string"))
        return F.array(
            *_person_contribution(node, "ThesisReview", cleaned(F.trim(s)), "dgc")
        )

    reviewers_arr = F.flatten(
        F.transform(F.coalesce(F.col("KRF"), F.array()), one_reviewer)
    )
    gate = has_core & advisor_name.isNotNull()
    reviewers = F.filter(
        reviewers_arr, lambda t: gate & t["obj"].isNotNull() & t["subj"].isNotNull()
    )

    # dissertant role + INST affiliation on the first person contribution
    first = F.when(
        F.size(F.coalesce(F.col("contribs"), F.array())) > 0,
        F.element_at(F.col("contribs"), 1),
    )
    first_is_person = F.coalesce(first["kind"] == "person", F.lit(False))
    cnode = frag(W(), "contribution", F.lit(1))
    agent = subfrag(cnode, "personagent")
    inst = cleaned(nullif_empty(F.col("INST")))
    dis_role = pack(
        T(cnode, NS.BF + "role", HTTPS_RELATORS + "dis", iri=True),
        when=has_core & inst.isNotNull() & first_is_person,
    )
    # institute affiliation only when the first contribution has none
    no_aff = first["org"].isNull() & first["country"].isNull()
    inst_struct = F.struct(
        inst.alias("org"), F.lit(None).cast("string").alias("country")
    )
    inst_aff_arr = _affiliation_triples(inst_struct, cnode, agent)
    aff_gate = has_core & inst.isNotNull() & first_is_person & F.coalesce(no_aff, F.lit(True))
    inst_aff = F.filter(
        inst_aff_arr, lambda t: aff_gate & t["obj"].isNotNull() & t["subj"].isNotNull()
    )

    return F.concat(core, advisor, reviewers, dis_role, inst_aff)
