"""N9-N14, N19 — work/instance relationship emitters (SURVEY §2.6) plus the
A3 url-vs-doi set dedup and A7 relationship counters.

Reference: /root/reference/modules/research_info.py —
relation_types config (:33-177), build_work_relationship_node (:208-298),
get_datac/get_urlai (:337-496), get_bf_preregistrations + trials (:550-809,
J20), RPLIC (:815-1094, P6 skip list), build_rels (:1167-1351, P12),
TESTG (:1404-1605); /root/reference/modules/instance_sources.py —
journal/series/book relationships (:194-428, J19, P8 chapter gate).

Crossref validation/lookup tiers (J13/J14) are external services; the
engine's emit path uses the record's own identifiers (doi/url/dfk/citation
fallback chain) — authority-backed doi resolution is a linking-stage join.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, functions as F

from psyndex2linkeddata_spark import namespaces as NS
from psyndex2linkeddata_spark.emit.base import T, cleaned, mainfield, pack, pack_arr, subfield, typ
from psyndex2linkeddata_spark.functions.cleaning import (nullif_empty)
from psyndex2linkeddata_spark.functions.instance_fields import (
    normalize_issn,
    split_pages,
)
from psyndex2linkeddata_spark.functions.text import title_except
from psyndex2linkeddata_spark.functions.trials import TRIAL_NUMBER_REGEXES

def W():
    return F.col("work")
def B():
    return F.col("bundle")

# relation_types config, verbatim semantics from research_info.py:33-177.
REL_TYPES: dict[str, dict] = {
    "rd_open_access": dict(relation="hasResearchData", subprop="supplement", subclass="Dataset", reltype="ResearchData", access_label="open access", access_concept="https://w3id.org/zpid/vocabs/access/open"),
    "rd_restricted_access": dict(relation="hasResearchData", subprop="supplement", subclass="Dataset", reltype="ResearchData", access_label="restricted access", access_concept="https://w3id.org/zpid/vocabs/access/open"),
    "preregistration": dict(relation="hasPreregistration", subprop="supplement", subclass="Text", reltype="Preregistration", access_label=None, access_concept=None),
    "replication": dict(relation="isReplicationOf", subprop="relatedTo", subclass="Text", reltype="Replication", access_label=None, access_concept=None),
    "reanalysis": dict(relation="isReanalysisOf", subprop="relatedTo", subclass="Text", reltype="Reanalysis", access_label=None, access_concept=None),
    "isRelatedTo": dict(relation="isRelatedTo", subprop="relatedTo", subclass="Text", reltype="RelatedWork", access_label=None, access_concept=None),
    "hasComment": dict(relation="hasComment", subprop="relatedTo", subclass="Text", reltype="RelatedWork", access_label=None, access_concept=None),
    "isCommentOn": dict(relation="isCommentOn", subprop="relatedTo", subclass="Text", reltype="RelatedWork", access_label=None, access_concept=None),
    "isReplyToComment": dict(relation="isReplyToComment", subprop="relatedTo", subclass="Text", reltype="RelatedWork", access_label=None, access_concept=None),
    "hasReplyToComment": dict(relation="hasReplyToComment", subprop="relatedTo", subclass="Text", reltype="RelatedWork", access_label=None, access_concept=None),
    "hasReplyToCommentsOnItself": dict(relation="hasReplyToCommentsOnItself", subprop="relatedTo", subclass="Text", reltype="RelatedWork", access_label=None, access_concept=None),
    "hasOlderEdition": dict(relation="hasOlderEdition", subprop="relatedTo", subclass="Text", reltype="RelatedWork", access_label=None, access_concept=None),
    "hasArticlePartOfCompilationThesis": dict(relation="hasArticlePartOfCompilationThesis", subprop="relatedTo", subclass="Text", reltype="RelatedWork", access_label=None, access_concept=None),
}


def _map(field: str) -> Column:
    return F.create_map(
        *chain.from_iterable(
            (F.lit(k), F.lit(v[field])) for k, v in REL_TYPES.items() if v[field]
        )
    )


def _RELATION():
    return _map("relation")
def _SUBPROP_IS_SUPPLEMENT():
    return F.create_map(
    *chain.from_iterable(
        (F.lit(k), F.lit(v["subprop"])) for k, v in REL_TYPES.items()
    )
)
def _SUBCLASS():
    return _map("subclass")
def _RELTYPE():
    return _map("reltype")
def _ACCESS_LABEL():
    return F.create_map(
    *chain.from_iterable(
        (F.lit(k), F.lit(v["access_label"]))
        for k, v in REL_TYPES.items()
        if v["access_label"]
    )
)


def rel_nodes(key: Column, count: Column) -> tuple[Column, Column, Column]:
    """(relationship_node, related_work_node, related_instance_node) URIs
    per build_work_relationship_node (research_info.py:208-241)."""
    subclass_rel = F.concat(_RELTYPE()[key], F.lit("Relationship"))
    rel_node = F.concat(W(), F.lit("#"), subclass_rel, count.cast("string"))
    work_node = F.concat(rel_node, F.lit("_work"))
    inst_node = F.concat(work_node, F.lit("_instance"))
    return rel_node, work_node, inst_node


def rel_base_triples(key: Column, count: Column) -> Column:
    """Skeleton triples of one relationship (types, relation, wiring,
    access policy) — ids attach separately."""
    rel_node, work_node, inst_node = rel_nodes(key, count)
    subclass_rel = F.concat(_RELTYPE()[key], F.lit("Relationship"))
    access_label = _ACCESS_LABEL()[key]
    access_node = F.when(
        access_label.isNotNull(),
        F.lit("https://w3id.org/zpid/vocabs/access/open"),
    )
    return F.array(
        T(rel_node, NS.RDF_TYPE, F.concat(F.lit(NS.PXC), subclass_rel), iri=True),
        T(rel_node, NS.BFLC + "relation", F.concat(F.lit(NS.RELATIONS), _RELATION()[key]), iri=True),
        typ(work_node, NS.BF + "Work"),
        T(work_node, NS.RDF_TYPE, F.concat(F.lit(NS.BF), _SUBCLASS()[key]), iri=True),
        T(rel_node, F.concat(F.lit(NS.BF), _SUBPROP_IS_SUPPLEMENT()[key]), work_node, iri=True),
        typ(inst_node, NS.BF + "Instance"),
        T(work_node, NS.BF + "hasInstance", inst_node, iri=True),
        T(access_node, NS.RDF_TYPE, NS.BF + "AccessPolicy", iri=True),
        T(access_node, NS.RDFS_LABEL, access_label),
        T(access_node, NS.SKOS + "prefLabel", access_label, lang="en"),
        T(access_node, NS.SKOS + "prefLabel", F.when(access_label.isNotNull(), F.lit("freier Zugang")), lang="de"),
        T(F.when(access_label.isNotNull(), inst_node), NS.BF + "usageAndAccessPolicy", access_node, iri=True),
        T(W(), NS.BFLC + "relationship", rel_node, iri=True),
    )


def _doi_triples(inst: Column, doi: Column) -> Column:
    node = F.concat(F.lit("https://doi.org/"), doi)
    return F.array(
        T(node, NS.RDF_TYPE, NS.BF + "Doi", iri=True),
        T(node, NS.RDF + "value", doi),
        T(inst, NS.BF + "identifiedBy", node, iri=True),
    )


def _locator_triple(inst: Column, url: Column) -> Column:
    return F.array(T(inst, NS.BF + "electronicLocator", url, iri=True))


def _note_triples(node_base: Column, note: Column) -> Column:
    note_node = F.when(note.isNotNull(), F.concat(node_base, F.lit("_note")))
    return F.array(
        T(note_node, NS.RDF_TYPE, NS.BF + "Note", iri=True),
        T(note_node, NS.RDFS_LABEL, note),
        T(node_base, NS.BF + "note", note_node, iri=True),
    )





def _ids_triples(inst: Column, ids: Column, note_unknown: bool = True) -> Column:
    """doi identifier nodes + electronicLocator urls (+ unknowns as notes on
    the instance, like get_datac/get_urlai do)."""
    dois = F.flatten(F.transform(ids["dois"], lambda d: _doi_triples(inst, d)))
    urls = F.flatten(F.transform(ids["urls"], lambda u: _locator_triple(inst, u)))
    if not note_unknown:
        return F.concat(dois, urls)
    notes = F.flatten(
        F.transform(ids["unknowns"], lambda n: _note_triples(inst, F.trim(n)))
    )
    return F.concat(dois, urls, notes)


def research_data() -> Column:
    """N10: DATAC (rd_open_access, |u/|d subfields) + URLAI
    (rd_restricted_access, whole field; counter offset by |DATAC| per A7).
    The parsed id-sets come from normalize's `datac_ids`/`urlai_ids`."""
    n_datac = F.size(F.coalesce(F.col("DATAC"), F.array()))

    def one_datac(ids: Column, i: Column) -> Column:
        key = F.lit("rd_open_access")
        count = i + 1
        _, _, inst = rel_nodes(key, count)
        return F.concat(rel_base_triples(key, count), _ids_triples(inst, ids))

    def one_urlai(ids: Column, i: Column) -> Column:
        key = F.lit("rd_restricted_access")
        count = n_datac + i + 1
        _, _, inst = rel_nodes(key, count)
        return F.concat(rel_base_triples(key, count), _ids_triples(inst, ids))

    return pack_arr(
        F.concat(
            F.flatten(F.transform(F.col("datac_ids"), one_datac)),
            F.flatten(F.transform(F.col("urlai_ids"), one_urlai)),
        )
    )


def _prereg_trials() -> Column:
    """J20/F20: first match of each registry regex per PRREG field, rule
    order (research_info.py:676-699: re.search per regex → one hit each)."""
    def one(s: Column) -> Column:
        parts = []
        for regex, registry in TRIAL_NUMBER_REGEXES:
            m = F.regexp_extract(cleaned(F.trim(s)), "(?i)" + regex, 0)
            parts.append(
                F.when(
                    F.length(m) > 0,
                    F.struct(m.alias("number"), F.lit(registry).alias("registry")),
                )
            )
        return F.array_compact(F.array(*parts))

    return F.flatten(F.transform(F.coalesce(F.col("PRREG"), F.array()), one))


def _trialnumber_triples(inst: Column, number: Column, registry: Column) -> Column:
    tn = F.concat(inst, F.lit("_trialnumber"))
    reg = F.concat(F.lit(NS.TRIALREGS), registry)
    return F.array(
        typ(tn, NS.PXC + "TrialNumber"),
        T(inst, NS.BF + "identifiedBy", tn, iri=True),
        T(tn, NS.RDF + "value", number),
        T(reg, NS.RDF_TYPE, NS.PXC + "TrialRegistry", iri=True),
        T(tn, NS.BF + "assigner", reg, iri=True),
    )


def preregistrations() -> Column:
    """N11: one preregistration relationship per PRREG (count=position,
    |u/|d ids, |i note) + J20 trial handling: a trial number whose URL is
    already among a prereg entry's locators enriches that entry's instance;
    otherwise it gets its own relationship numbered after |PRREG|."""
    key = F.lit("preregistration")
    entries = F.col("prereg_entries")
    n_prreg = F.size(F.coalesce(F.col("PRREG"), F.array()))

    def one_entry(e: Column) -> Column:
        rel_node, _, inst = rel_nodes(key, e["n"])
        # note on the RELATIONSHIP node: |i note (+ '. ' + unknown content)
        unknown = F.when(
            F.size(e["ids"]["unknowns"]) > 0, F.element_at(e["ids"]["unknowns"], 1)
        )
        note = F.when(
            e["note"].isNotNull() & unknown.isNotNull(),
            F.concat(e["note"], F.lit(". "), unknown),
        ).otherwise(F.coalesce(e["note"], unknown))
        return F.concat(
            rel_base_triples(key, e["n"]),
            _ids_triples(inst, e["ids"], note_unknown=False),
            _note_triples(rel_node, note),
        )

    entry_triples = F.flatten(F.transform(entries, one_entry))

    trials = _prereg_trials()

    def match_n(t: Column) -> Column:
        """position of the first prereg entry whose url contains the number."""
        hits = F.filter(
            entries,
            lambda e: F.exists(e["ids"]["urls"], lambda u: u.contains(t["number"])),
        )
        return F.when(F.size(hits) > 0, F.element_at(hits, 1)["n"])

    matched = F.transform(
        trials, lambda t: F.struct(t["number"].alias("number"), t["registry"].alias("registry"), match_n(t).alias("n"))
    )

    def one_matched(t: Column) -> Column:
        _, _, inst = rel_nodes(key, t["n"])
        return _trialnumber_triples(inst, t["number"], t["registry"])

    matched_triples = F.flatten(
        F.transform(F.filter(matched, lambda t: t["n"].isNotNull()), one_matched)
    )

    unmatched = F.filter(matched, lambda t: t["n"].isNull())

    def one_unmatched(t: Column, i: Column) -> Column:
        count = n_prreg + i + 1
        _, _, inst = rel_nodes(key, count)
        return F.concat(
            rel_base_triples(key, count),
            _trialnumber_triples(inst, t["number"], t["registry"]),
        )

    unmatched_triples = F.flatten(F.transform(unmatched, one_unmatched))
    return pack_arr(F.concat(entry_triples, matched_triples, unmatched_triples))


_RPLIC_SKIP = ["Testeintrag, wieder loeschen", "dittrich, K.", "no URL", "no URL |f  |u  |d "]


def replications() -> Column:
    """N12: RPLIC → replication relationship (count=1). Identifier priority:
    7-digit |f DFK > doi > url > citation (research_info.py:815-1094; the
    Crossref validation J13/J14 tiers resolve offline via linking)."""
    key = F.lit("replication")

    def one(p: Column) -> Column:
        cstr = p["cstr"]
        skip = cstr.isin(_RPLIC_SKIP)
        dfk = p["dfk"]
        dfk_ok = dfk.isNotNull() & dfk.rlike(r"^\d{7}$")
        ids = p["ids"]
        doi = F.when(F.size(ids["dois"]) > 0, F.element_at(ids["dois"], 1))
        url = F.when(F.size(ids["urls"]) > 0, F.element_at(ids["urls"], 1))
        citation = F.when(
            F.size(ids["unknowns"]) > 0, F.element_at(ids["unknowns"], 1)
        )
        # the reference's end-of-function overwrite (research_info.py:
        # 905-906): when no DOI/URL tier returned early, the mainfield —
        # even one F3 typed as a (rejected) doi — becomes the citation
        main = p["main"]
        main_ok = main.isNotNull() & ~main.isin(_RPLIC_SKIP)
        citation = F.when(main_ok, main).otherwise(citation)
        has_any = dfk_ok | doi.isNotNull() | url.isNotNull() | citation.isNotNull()
        rel_node, work_node, inst = rel_nodes(key, F.lit(1))
        dfk_id_node = F.concat(inst, F.lit("_dfk"))
        id_triples = (
            F.when(
                dfk_ok,
                F.array(
                    typ(dfk_id_node, NS.PXC + "DFK"),
                    T(dfk_id_node, NS.RDF + "value", dfk),
                    T(inst, NS.BF + "identifiedBy", dfk_id_node, iri=True),
                ),
            )
            .when(doi.isNotNull(), _doi_triples(inst, doi))
            .when(url.isNotNull(), _locator_triple(inst, url))
            .otherwise(
                F.array(T(inst, NS.BF + "preferredCitation", citation))
            )
        )
        arr = F.concat(rel_base_triples(key, F.lit(1)), id_triples)
        keep = ~skip & has_any
        return F.filter(
            arr, lambda t: keep & t["obj"].isNotNull() & t["subj"].isNotNull()
        )

    return pack_arr(F.flatten(F.transform(F.col("rplic_parsed"), one)))


def related_works() -> Column:
    """N13: REL fields typed by BE/BN/CM flags (research_info.py:1167-1351):
    books turn 'Original' into hasOlderEdition, compilation theses into
    hasArticlePartOfCompilationThesis, comment CMs into isCommentOn/
    isReplyToComment variants, everything else through
    handle_other_relations (Comment→hasComment, Reply→
    hasReplyToCommentsOnItself, Original/None→isRelatedTo). A |b-only or
    empty REL aborts the remaining fields (the reference `return`s, P12)."""
    be = F.trim(F.coalesce(F.col("BE"), F.lit("")))
    book = be.isin("SS", "SM")
    bn = F.coalesce(F.col("BN"), F.lit(""))
    compilation = bn.startswith("Kumu")
    cms = F.coalesce(F.col("CM"), F.array())
    has_comment = F.exists(cms, lambda c: c.startswith("|c 14100"))
    has_comment_reply = F.exists(cms, lambda c: c.startswith("|c 14110"))
    has_comment_appended = F.exists(cms, lambda c: c.startswith("|c 14120"))

    rels = F.col("rel_parsed")
    # P12 abort: keep only the prefix before the first invalid field
    def invalid(p: Column) -> Column:
        t = p["cstr"]
        return (t == "") | (t.startswith("|b") & (F.length(t) - F.length(F.replace(t, F.lit("|"), F.lit(""))) == 1))

    first_bad = F.array_position(F.transform(rels, invalid), True)
    usable = F.when(first_bad > 0, F.slice(rels, 1, first_bad - 1)).otherwise(rels)

    def rel_key(b: Column) -> Column:
        base = (
            F.when(book & (b == "Original"), F.lit("hasOlderEdition"))
            .when(compilation & (b == "Original"), F.lit("hasArticlePartOfCompilationThesis"))
            .when(has_comment & b.isin("Comment", "Original"), F.lit("isCommentOn"))
            .when(has_comment & (b.isNull() | (b == "Reply")), F.lit("hasReplyToComment"))
            .when(has_comment_reply & (b.isNull() | b.isin("Comment", "Reply")), F.lit("isReplyToComment"))
            .when(has_comment_reply & (b == "Original"), F.lit("hasReplyToCommentsOnItself"))
            .when(has_comment_appended, F.lit("isCommentOn"))
        )
        other = (
            F.when(b == "Comment", F.lit("hasComment"))
            .when(b == "Reply", F.lit("hasReplyToCommentsOnItself"))
            .otherwise(F.lit("isRelatedTo"))
        )
        return F.coalesce(base, other)

    def one(p: Column, i: Column) -> Column:
        cstr = p["cstr"]
        b = p["b"]
        key = rel_key(b)
        count = i + 1
        rel_node, work_node, inst = rel_nodes(key, count)

        dfk = F.when(F.substring(cstr, 1, 7).rlike(r"^\d{7}$"), F.substring(cstr, 1, 7))
        checked = p["checked"]
        doi = F.when(dfk.isNull() & (checked["type"] == "doi"), checked["value"])
        url = F.when(dfk.isNull() & (checked["type"] == "url"), checked["value"])
        # composed |a/|t/|j/|q citation (hoisted into rel_parsed); the
        # crossref_doi tier (J14, research_info.py:1268-1276) fills in
        # when plans.crossref.resolve_rel_dois ran with an authority
        citation = p["citation"]
        crossref_doi = p["crossref_doi"]
        dfk_id_node = F.concat(inst, F.lit("_dfk"))
        id_triples = (
            F.when(
                dfk.isNotNull(),
                F.array(
                    typ(dfk_id_node, NS.PXC + "DFK"),
                    T(dfk_id_node, NS.RDF + "value", dfk),
                    T(inst, NS.BF + "identifiedBy", dfk_id_node, iri=True),
                ),
            )
            .when(doi.isNotNull(), _doi_triples(inst, doi))
            .when(url.isNotNull(), _locator_triple(inst, url))
            .when(crossref_doi.isNotNull(), _doi_triples(inst, crossref_doi))
            .when(citation.isNotNull(), F.array(T(inst, NS.BF + "preferredCitation", citation)))
            .otherwise(F.array(T(F.lit(None).cast("string"), NS.RDF + "value", F.lit(None))))
        )
        return F.concat(rel_base_triples(key, count), id_triples)

    return pack_arr(F.flatten(F.transform(usable, one)))


def tests_measures() -> Column:
    """N14: TESTG → work#TestRelationship{index} (1-based, research_info
    .py:1524 `index + 1`) a
    bflc:Relationship + pxc:TestRelationship with pxc:Test node, long/short
    title nodes, PsytkomTestId from |c, uncontrolledTestId from |n,
    allItemsInWork from |v, remark |k (+ |u/|f/|d suffixes), relation
    usesTest / analyzesTest (|z x) (research_info.py:1404-1605)."""

    def one(p: Column, i: Column) -> Column:
        short = p["short"]
        long = p["long"]
        relation = p["relation"]
        test_id = p["test_id"]
        uncontrolled = test_id.isNull()
        unc_id = p["unc_id"]
        items = F.when(p["items"], F.lit("true")).otherwise(F.lit("false"))
        remark = p["remark"]

        rel = F.concat(W(), F.lit("#TestRelationship"), (i + 1).cast("string"))
        test = F.concat(rel, F.lit("_test"))
        long_node = F.when(long.isNotNull(), F.concat(test, F.lit("_longName")))
        short_node = F.when(short.isNotNull(), F.concat(test, F.lit("_shortName")))
        remark_node = F.when(remark.isNotNull(), F.concat(rel, F.lit("_remark")))
        tid_node = F.when(test_id.isNotNull(), F.concat(test, F.lit("_testId")))
        valid = short.isNotNull() | long.isNotNull()
        arr = F.array(
            typ(rel, NS.BFLC + "Relationship"),
            typ(rel, NS.PXC + "TestRelationship"),
            T(W(), NS.BFLC + "relationship", rel, iri=True),
            typ(test, NS.PXC + "Test"),
            T(test, NS.RDF_TYPE, F.when(uncontrolled, F.lit(NS.BFLC + "Uncontrolled")), iri=True),
            T(rel, NS.BFLC + "relatedTo", test, iri=True),
            T(long_node, NS.RDF_TYPE, NS.BF + "Title", iri=True),
            T(long_node, NS.BF + "mainTitle", long),
            T(test, NS.BF + "title", long_node, iri=True),
            T(short_node, NS.RDF_TYPE, NS.BF + "AbbreviatedTitle", iri=True),
            T(short_node, NS.BF + "mainTitle", short),
            T(test, NS.BF + "title", short_node, iri=True),
            T(remark_node, NS.RDF_TYPE, NS.BF + "Note", iri=True),
            T(remark_node, NS.RDFS_LABEL, remark),
            T(rel, NS.BF + "note", remark_node, iri=True),
            T(tid_node, NS.RDF_TYPE, NS.PXC + "PsytkomTestId", iri=True),
            T(tid_node, NS.RDF + "value", test_id),
            T(test, NS.BF + "identifiedBy", tid_node, iri=True),
            T(
                test,
                NS.PXP + "uncontrolledTestId",
                F.when(unc_id.isNotNull() & (F.trim(unc_id) != "0000"), unc_id),
            ),
            T(rel, NS.PXP + "allItemsInWork", items, dtype=NS.XSD_BOOLEAN),
            T(rel, NS.BFLC + "relation", F.concat(F.lit(NS.RELATIONS), relation), iri=True),
        )
        return F.filter(arr, lambda t: valid & t["obj"].isNotNull() & t["subj"].isNotNull())

    return pack_arr(F.flatten(F.transform(F.col("testg_parsed"), one)))


def journal_relation() -> Column:
    """N19 journal + series (instance_sources.py:194-288): bundle#journalrel
    a bflc:Relationship → _journal a bf:Serial+bf:Hub with title node and
    print/online ISSN identifier nodes; inVolume/inIssue/pageStart/pageEnd,
    article number identifier, seriesStatement + seriesEnumeration; plus
    bundle#seriesrel from SE."""
    jt = cleaned(F.trim(F.col("JT")))
    vol = F.trim(F.col("JBD"))
    issue = F.trim(F.col("JHFT"))
    pages = split_pages(F.trim(F.col("PAGE")))
    ps, pe, art = pages["page_start"], pages["page_end"], pages["article_number"]
    issn = F.when(F.col("ISSN").isNotNull(), normalize_issn(F.col("ISSN")))
    eissn = F.when(F.col("EISSN").isNotNull(), normalize_issn(F.col("EISSN")))

    rel = F.concat(B(), F.lit("#journalrel"))
    journal = F.concat(rel, F.lit("_journal"))
    title_node = F.concat(journal, F.lit("_title"))
    issn_node = F.concat(journal, F.lit("_issnprint"))
    eissn_node = F.concat(journal, F.lit("_issnonline"))
    art_node = F.concat(rel, F.lit("_article_number"))

    enumeration = F.concat(
        F.when(vol.isNotNull(), F.concat(F.lit(" "), vol)).otherwise(F.lit("")),
        F.when(issue.isNotNull(), F.concat(F.lit("("), issue, F.lit(")"))).otherwise(F.lit("")),
        F.when(ps.isNotNull(), F.concat(F.lit(", p. "), ps)).otherwise(F.lit("")),
        F.when(pe.isNotNull(), F.concat(F.lit("-"), pe)).otherwise(F.lit("")),
        F.when(art.isNotNull(), F.concat(F.lit(", Article number: "), art)).otherwise(F.lit("")),
    )

    journal_part = pack(
        T(B(), NS.BFLC + "relationship", rel, iri=True),
        typ(rel, NS.BFLC + "Relationship"),
        T(rel, NS.BF + "relatedTo", journal, iri=True),
        typ(journal, NS.BF + "Serial"),
        typ(journal, NS.BF + "Hub"),
        T(journal, NS.BF + "title", title_node, iri=True),
        typ(title_node, NS.BF + "Title"),
        T(title_node, NS.BF + "mainTitle", jt),
        # ISSNs (F14) on the journal hub node
        T(F.when(issn.isNotNull(), issn_node), NS.RDF_TYPE, NS.BF + "Issn", iri=True),
        T(issn_node, NS.RDF + "value", issn),
        T(F.when(issn.isNotNull(), issn_node), NS.BF + "qualifier", F.lit("print")),
        T(F.when(issn.isNotNull(), journal), NS.BF + "identifiedBy", issn_node, iri=True),
        T(F.when(eissn.isNotNull(), eissn_node), NS.RDF_TYPE, NS.BF + "Issn", iri=True),
        T(eissn_node, NS.RDF + "value", eissn),
        T(F.when(eissn.isNotNull(), eissn_node), NS.BF + "qualifier", F.lit("online")),
        T(F.when(eissn.isNotNull(), journal), NS.BF + "identifiedBy", eissn_node, iri=True),
        T(rel, NS.PXP + "inVolume", vol),
        T(rel, NS.PXP + "inIssue", issue),
        T(rel, NS.PXP + "pageStart", ps),
        T(rel, NS.PXP + "pageEnd", pe),
        T(F.when(art.isNotNull(), art_node), NS.RDF_TYPE, NS.PXC + "ArticleNumber", iri=True),
        T(art_node, NS.RDF + "value", art),
        T(F.when(art.isNotNull(), rel), NS.BF + "identifiedBy", art_node, iri=True),
        T(B(), NS.BF + "seriesStatement", jt),
        T(
            rel,
            NS.BF + "seriesEnumeration",
            F.when(F.trim(enumeration) != "", F.trim(enumeration)),
        ),
        when=F.col("JT").isNotNull(),
    )

    # series relationship from SE (F13)
    from psyndex2linkeddata_spark.functions.instance_fields import split_series

    se = split_series(cleaned(F.trim(F.col("SE"))))
    srel = F.concat(B(), F.lit("#seriesrel"))
    series = F.concat(srel, F.lit("_series"))
    stitle = F.concat(series, F.lit("_title"))
    series_part = pack(
        T(B(), NS.BF + "seriesStatement", se["series_title"]),
        T(B(), NS.BFLC + "relationship", srel, iri=True),
        typ(srel, NS.BFLC + "Relationship"),
        T(srel, NS.BF + "relatedTo", series, iri=True),
        typ(series, NS.BF + "Series"),
        typ(series, NS.BF + "Hub"),
        T(series, NS.BF + "title", stitle, iri=True),
        typ(stitle, NS.BF + "Title"),
        T(stitle, NS.BF + "mainTitle", se["series_title"]),
        T(srel, NS.BF + "seriesEnumeration", se["series_volume"]),
        when=F.col("SE").isNotNull(),
    )
    return F.concat(journal_part, series_part)


def book_relation() -> Column:
    """N19 book / J19 (instance_sources.py:339-428 + P8 gate
    convert_starxml_to_bf.py:1383): chapters (BE US/UR) get bundle#bookrel
    → _book a pxc:InstanceBundle, owl:sameAs instancebundles:{SSDFK} when
    known else bflc:Uncontrolled; BIP (superordinate book title) always
    exported as _book_title a bf:Title / bf:mainTitle
    (instance_sources.py:404-410 — even when the SSDFK link exists);
    pageStart/pageEnd/extent + article no."""
    is_chapter = F.trim(F.coalesce(F.col("BE"), F.lit(""))).isin("US", "UR")
    rel = F.concat(B(), F.lit("#bookrel"))
    book = F.concat(rel, F.lit("_book"))
    ssdfk = nullif_empty(F.col("SSDFK"))
    target = F.concat(F.lit(NS.INSTANCEBUNDLES), ssdfk)
    bip = nullif_empty(F.col("BIP"))
    btitle = F.concat(book, F.lit("_title"))
    pages = split_pages(F.trim(F.col("PAGE")))
    art_node = F.concat(rel, F.lit("_article_number"))
    return pack(
        T(B(), NS.BFLC + "relationship", rel, iri=True),
        typ(rel, NS.BFLC + "Relationship"),
        T(rel, NS.BF + "partOf", book, iri=True),
        typ(book, NS.PXC + "InstanceBundle"),
        T(book, NS.OWL + "sameAs", target, iri=True),
        T(F.when(ssdfk.isNotNull(), target), NS.RDF_TYPE, NS.PXC + "InstanceBundle", iri=True),
        T(F.when(ssdfk.isNull(), book), NS.RDF_TYPE, NS.BFLC + "Uncontrolled", iri=True),
        # BIP → book title (always, even alongside an SSDFK owl:sameAs)
        T(F.when(bip.isNotNull(), btitle), NS.RDF_TYPE, NS.BF + "Title", iri=True),
        T(btitle, NS.BF + "mainTitle", bip),
        T(F.when(bip.isNotNull(), book), NS.BF + "title", btitle, iri=True),
        T(rel, NS.PXP + "pageStart", pages["page_start"]),
        T(rel, NS.PXP + "pageEnd", pages["page_end"]),
        T(B(), NS.PXP + "extent", pages["extent"]),
        T(F.when(pages["article_number"].isNotNull(), art_node), NS.RDF_TYPE, NS.PXC + "ArticleNumber", iri=True),
        T(art_node, NS.RDF + "value", pages["article_number"]),
        T(F.when(pages["article_number"].isNotNull(), rel), NS.BF + "identifiedBy", art_node, iri=True),
        when=is_chapter,
    )
