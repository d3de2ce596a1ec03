"""N5 — abstract emitters (SURVEY §2.6).

Reference: /root/reference/modules/abstract.py — get_bf_abstract (:128-245),
get_bf_secondary_abstract (:246-321), add_abstract_licensing_note (:61-124),
get_abstract_release (:324-334).

Source/editor fields (abstract.py:198-231, 285-304): the primary
abstract's origin comes from ASH1 (default "Original") with the optional
editing agent in ASH2 (→ bf:descriptionModifier); the secondary
abstract's origin from ASN1 with its editor in ASN2. All four run
through the same F22 recode (replace_abstract_origin_string).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from psyndex2linkeddata_spark import namespaces as NS
from psyndex2linkeddata_spark.emit.base import T, cleaned, frag, pack, subfrag, typ
from psyndex2linkeddata_spark.functions.lang import guess_language, langtag2
from psyndex2linkeddata_spark.functions.licenses import abstract_origin
from psyndex2linkeddata_spark.functions.text import split_licensing_note, split_toc

def W():
    return F.col("work")


def _blocked() -> Column:
    """P11 get_abstract_release (abstract.py:324-334): Elsevier DOI stem +
    publisher copyright → abstract blocked from release."""
    return (
        F.coalesce(F.col("DOI"), F.lit("")).contains("10.1016")
        & F.coalesce(F.col("COPR"), F.lit("")).contains("PUBL")
    )


def _is_no_abstract(text: Column, max_len: int) -> Column:
    """P7 (abstract.py:131-135,249-256): short 'no abstract' placeholder."""
    return (F.length(text) < max_len) & text.rlike("(?i)(no abstract|kein Abstract)")


def _one_abstract(
    node: Column,
    raw: Column,
    lang_field: Column,
    origin_field: Column,
    editor_field: Column,
    *,
    secondary: bool,
) -> Column:
    cstr = cleaned(F.trim(raw))
    # ToC peeled off FIRST (primary only), then the licensing note
    toc_split = split_toc(cstr)
    body0 = cstr if secondary else toc_split["abstract"]
    lic = split_licensing_note(body0)
    body = F.trim(lic["abstract"])

    lang = F.when(
        lang_field.isNotNull() & (langtag2(F.trim(lang_field)) != "und"),
        langtag2(F.trim(lang_field)),
    ).otherwise(guess_language(body))

    source_node = subfrag(node, "source")
    origin = F.when(
        origin_field.isNotNull(), abstract_origin(F.trim(origin_field))
    ).otherwise(F.lit("Original"))
    # optional editing agent (ASH2/ASN2 → bf:descriptionModifier,
    # abstract.py:219-231/297-304), same F22 recode as the origin
    editor = F.when(editor_field.isNotNull(), abstract_origin(F.trim(editor_field)))

    blocked = _blocked()
    lic_node = F.when(lic["note"].isNotNull(), subfrag(node, "license"))
    lic_label = F.when(blocked, F.lit("Abstract not released by publisher.")).otherwise(
        lic["note"]
    )

    toc_node = frag(W(), "toc")
    toc = toc_split["toc"]

    triples = [
        typ(node, NS.PXC + "Abstract"),
        T(node, NS.RDFS_LABEL, body, lang=lang),
        typ(source_node, NS.BF + "AdminMetadata"),
        T(source_node, NS.BFLC + "metadataLicensor", origin),
        T(source_node, NS.BF + "descriptionModifier", editor),
        T(
            source_node,
            NS.PXP + "blockedAbstract",
            F.when(blocked, F.lit("true")).otherwise(F.lit("false")),
            dtype=NS.XSD_BOOLEAN,
        ),
        T(node, NS.BF + "adminMetadata", source_node, iri=True),
        T(W(), NS.BF + "summary", node, iri=True),
        # licensing note (F25)
        T(node, NS.BF + "usageAndAccessPolicy", lic_node, iri=True),
        T(lic_node, NS.RDF_TYPE, NS.BF + "UsageAndAccessPolicy", iri=True),
        T(lic_node, NS.RDFS_LABEL, F.when(lic_node.isNotNull(), lic_label)),
    ]
    if secondary:
        triples.insert(1, typ(node, NS.PXC + "SecondaryAbstract"))
    else:
        # ToC node (F24, abstract.py:149-169)
        has_toc = toc.isNotNull()
        triples += [
            T(F.when(has_toc, toc_node), NS.RDF_TYPE, NS.BF + "TableOfContents", iri=True),
            T(W(), NS.BF + "tableOfContents", F.when(has_toc, toc_node), iri=True),
            T(
                toc_node,
                NS.RDF + "value",
                F.when(has_toc & toc_split["toc_is_url"], toc),
                dtype=NS.XSD_ANYURI,
            ),
            T(
                F.when(has_toc & ~toc_split["toc_is_url"], toc_node),
                NS.RDFS_LABEL,
                toc,
                lang=guess_language(toc),
            ),
        ]
    return triples


def abstracts() -> Column:
    """Primary (work#abstract) + secondary (work#secondaryabstract) nodes."""
    primary_ok = F.col("ABH").isNotNull() & ~_is_no_abstract(F.col("ABH"), 500)
    secondary_ok = F.col("ABN").isNotNull() & ~_is_no_abstract(F.col("ABN"), 50)
    prim = pack(
        *_one_abstract(
            frag(W(), "abstract"),
            F.col("ABH"),
            F.col("ABLH"),
            F.col("ASH1"),
            F.col("ASH2"),
            secondary=False,
        ),
        when=primary_ok,
    )
    sec = pack(
        *_one_abstract(
            frag(W(), "secondaryabstract"),
            F.col("ABN"),
            F.col("ABLN"),
            F.col("ASN1"),
            F.col("ASN2"),
            secondary=True,
        ),
        when=secondary_ok,
    )
    return F.concat(prim, sec)
