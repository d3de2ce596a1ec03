"""Core emitters: N1 work root, N2 titles, N16 instances, N17 identifiers,
N18 publication info (SURVEY §2.6).

Each function returns an array<triple> Column over the normalized records
DataFrame (columns: record fields + work, bundle, contribs, instances).
Reference anchors cited per emitter. Everything is native expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from psyndex2linkeddata_spark import namespaces as NS
from psyndex2linkeddata_spark.emit.base import T, cleaned, frag, instance_uri, pack, pack_arr, subfield, typ
from psyndex2linkeddata_spark.functions.cleaning import (nullif_empty)
from psyndex2linkeddata_spark.functions.dates import date_or_year
from psyndex2linkeddata_spark.functions.lang import (
    guess_language,
    langtag2,
    langtag3,
)
from psyndex2linkeddata_spark.functions.text import parse_translated_title
from psyndex2linkeddata_spark.functions.urls import pct_quote

def W():
    return F.col("work")
def B():
    return F.col("bundle")


def work_core() -> Column:
    """N1 (/root/reference/convert_starxml_to_bf.py:1196-1205,1316,1324 and
    modules/publication_types.py:29-108 generate_content_type):

    work a bf:Work, pxc:MainWork; bf:language from LA; bf:content from DT
    (DT≠'40' → contentTypes:text + rdf:type bf:Text; DT='40' → spokenWord +
    bf:NonMusicAudio — the engine's corpus has no DT2/AV split beyond this);
    work pxp:hasInstanceBundle bundle; bundle a pxc:InstanceBundle.
    """
    is_av = F.col("DT") == "40"
    content = F.when(is_av, F.lit("spokenWord")).otherwise(F.lit("text"))
    content_uri = F.concat(F.lit(NS.CONTENT), content)
    subclass = F.when(is_av, F.lit(NS.BF + "NonMusicAudio")).otherwise(
        F.lit(NS.BF + "Text")
    )
    return pack(
        typ(W(), NS.BF + "Work"),
        typ(W(), NS.PXC + "MainWork"),
        T(
            W(),
            NS.BF + "language",
            F.when(
                F.col("LA").isNotNull(),
                F.concat(F.lit(NS.LANG), langtag3(F.trim(F.col("LA")))),
            ),
            iri=True,
        ),
        T(content_uri, NS.RDF_TYPE, NS.BF + "Content", iri=True),
        T(W(), NS.BF + "content", content_uri, iri=True),
        T(W(), NS.RDF_TYPE, subclass, iri=True),
        T(W(), NS.PXP + "hasInstanceBundle", B(), iri=True),
        typ(B(), NS.PXC + "InstanceBundle"),
    )


def _lang_or_guess(lang_field: Column, text: Column) -> Column:
    """Reference pattern (convert_starxml_to_bf.py:614-631): language-name
    field if present and known, else guess from the string itself."""
    tagged = langtag2(F.trim(lang_field))
    return F.when(
        lang_field.isNotNull() & (tagged != "und"), tagged
    ).otherwise(guess_language(text))


def titles() -> Column:
    """N2 (/root/reference/convert_starxml_to_bf.py:600-705,1432-1449):

    bundle#title a bf:Title with mainTitle@lang(TIL|guess), subtitle@lang,
    rdfs:label fulltitle; bundle bf:title it. TIUE → bundle#translatedtitle
    a pxc:TranslatedTitle with |s language (else guess), '(DeepL)' trailing
    marker → adminMetadata source node (metadataLicensor DeepL, else ZPID).
    """
    title = frag(B(), "title")
    main = cleaned(F.trim(F.col("TI")))
    main_lang = _lang_or_guess(F.col("TIL"), main)
    sub = cleaned(F.trim(F.col("TIU")))
    # TIUL language name when present/known, else guess (reference
    # convert_starxml_to_bf.py:643-651)
    sub_lang = _lang_or_guess(F.col("TIUL"), sub)
    fulltitle = F.when(
        F.col("TIU").isNotNull(), F.concat(main, F.lit(". "), sub)
    ).otherwise(main)

    tt = parse_translated_title(F.col("TIUE"))
    translated = frag(B(), "translatedtitle")
    tt_source = F.concat(translated, F.lit("_source"))
    tt_lang = F.when(
        tt["lang_name"].isNotNull(), langtag2(tt["lang_name"])
    ).otherwise(guess_language(tt["title"]))
    tt_licensor = F.coalesce(tt["origin"], F.lit("ZPID"))
    has_tt = nullif_empty(F.col("TIUE")).isNotNull()

    main_part = pack(
        T(B(), NS.BF + "title", title, iri=True),
        typ(title, NS.BF + "Title"),
        T(title, NS.BF + "mainTitle", main, lang=main_lang),
        T(title, NS.BF + "subtitle", sub, lang=sub_lang),
        T(title, NS.RDFS_LABEL, fulltitle),
        when=F.col("TI").isNotNull(),
    )
    tt_part = pack(
        T(B(), NS.BF + "title", translated, iri=True),
        typ(translated, NS.PXC + "TranslatedTitle"),
        T(translated, NS.BF + "mainTitle", cleaned(tt["title"]), lang=tt_lang),
        T(translated, NS.RDFS_LABEL, cleaned(tt["title"])),
        T(translated, NS.BF + "adminMetadata", tt_source, iri=True),
        typ(tt_source, NS.BF + "AdminMetadata"),
        T(tt_source, NS.BFLC + "metadataLicensor", tt_licensor),
        when=has_tt,
    )
    return F.concat(main_part, tt_part)


def instances() -> Column:
    """N16 (/root/reference/convert_starxml_to_bf.py:1310-1420,
    modules/publication_types.py:675-800): 1-2 bf:Instance nodes wired
    hasPart/instanceOf/hasInstance, with pxp:mediaCarrier pmt:{Print,Online},
    subclass bf:{Print,Electronic}, RDA bf:media/bf:carrier codes."""
    def one(inst: Column) -> Column:
        uri = instance_uri(F.col("DFK"), inst["n"])
        has_mc = inst["mediacarrier"].isNotNull()
        subclass = F.when(
            inst["mediacarrier"] == "Online", F.lit(NS.BF + "Electronic")
        ).when(inst["mediacarrier"] == "Print", F.lit(NS.BF + "Print"))
        return pack(
            typ(uri, NS.BF + "Instance"),
            T(B(), NS.BF + "hasPart", uri, iri=True),
            T(uri, NS.BF + "instanceOf", W(), iri=True),
            T(W(), NS.BF + "hasInstance", uri, iri=True),
            T(
                uri,
                NS.PXP + "mediaCarrier",
                F.when(has_mc, F.concat(F.lit(NS.PMT), inst["mediacarrier"])),
                iri=True,
            ),
            T(uri, NS.RDF_TYPE, subclass, iri=True),
            T(
                uri,
                NS.BF + "media",
                F.when(has_mc, F.concat(F.lit(NS.MEDIA), inst["media_code"])),
                iri=True,
            ),
            T(
                uri,
                NS.BF + "carrier",
                F.when(has_mc, F.concat(F.lit(NS.CARRIER), inst["carrier_code"])),
                iri=True,
            ),
        )

    return F.flatten(F.transform(F.col("instances"), one))


def locator_instance_ns() -> Column:
    """A8 (/root/reference/convert_starxml_to_bf.py:1466-1503): the
    instances that receive DOI/URL/URN — the only instance when there is
    one, else EVERY pmt:Online instance (the reference loops over all
    instances without breaking); empty when several instances but none
    Online (the reference drops the ids in that case too)."""
    insts = F.col("instances")
    online = F.filter(insts, lambda i: i["mediacarrier"] == "Online")
    ns_of = lambda arr: F.transform(arr, lambda i: i["n"])  # noqa: E731
    return F.when(F.size(insts) == 1, ns_of(insts)).otherwise(ns_of(online))


def identifiers() -> Column:
    """N17 (/root/reference/modules/identifiers.py:23-102, convert_starxml_
    to_bf.py:364-429,1460-1503): DFK node bundle+'_dfk' a pxc:DFK; ISBNs from
    PU |i/|e ONLY (add_isbns reads no standalone field) as
    bundle#isbn_print / #isbn_ebook a bf:Isbn; on the A8 target instance:
    DOI (validated via F3) as node https://doi.org/{quote(doi)} a bf:Doi
    (identifiers.py:28 percent-encodes the DOI into the node URI; the
    rdf:value stays raw), URN (node = the urn string) a bf:Urn, and URLI
    (F3-validated as url) directly as bf:electronicLocator
    (identifiers.py:82-89 — bare URI, no intermediary node)."""
    dfk_node = F.concat(B(), F.lit("_dfk"))
    isbn_print = subfield(F.col("PU"), "i")
    isbn_ebook = subfield(F.col("PU"), "e")
    isbn_p_node = frag(B(), "isbn_print")
    isbn_e_node = frag(B(), "isbn_ebook")

    checked = F.col("doi_checked")
    doi = F.when(checked["type"] == "doi", checked["value"])
    doi_node = F.concat(F.lit("https://doi.org/"), pct_quote(doi))
    urn = nullif_empty(F.col("URN"))
    urli_checked = F.col("urli_checked")
    urli = F.when(urli_checked["type"] == "url", urli_checked["value"])
    targets = F.transform(
        locator_instance_ns(), lambda n: instance_uri(F.col("DFK"), n)
    )
    # DOI / URN / URLI on every A8 target instance
    per_target = pack_arr(
        F.flatten(
            F.transform(
                targets,
                lambda target: F.array(
                    T(F.when(doi.isNotNull(), doi_node), NS.RDF_TYPE, NS.BF + "Doi", iri=True),
                    T(F.when(doi.isNotNull(), doi_node), NS.RDF + "value", doi),
                    T(F.when(doi.isNotNull(), target), NS.BF + "identifiedBy", doi_node, iri=True),
                    T(F.when(urn.isNotNull(), urn), NS.RDF_TYPE, NS.BF + "Urn", iri=True),
                    T(F.when(urn.isNotNull(), urn), NS.RDF + "value", urn),
                    T(F.when(urn.isNotNull(), target), NS.BF + "identifiedBy", urn, iri=True),
                    T(F.when(urli.isNotNull(), target), NS.BF + "electronicLocator", urli, iri=True),
                ),
            )
        )
    )
    return F.concat(pack(
        typ(dfk_node, NS.PXC + "DFK"),
        T(dfk_node, NS.RDF + "value", F.col("DFK")),
        T(B(), NS.BF + "identifiedBy", dfk_node, iri=True),
        # isbn print
        T(B(), NS.BF + "identifiedBy", F.when(isbn_print.isNotNull(), isbn_p_node), iri=True),
        T(F.when(isbn_print.isNotNull(), isbn_p_node), NS.RDF_TYPE, NS.BF + "Isbn", iri=True),
        T(isbn_p_node, NS.RDF + "value", isbn_print),
        # isbn ebook
        T(B(), NS.BF + "identifiedBy", F.when(isbn_ebook.isNotNull(), isbn_e_node), iri=True),
        T(F.when(isbn_ebook.isNotNull(), isbn_e_node), NS.RDF_TYPE, NS.BF + "Isbn", iri=True),
        T(isbn_e_node, NS.RDF + "value", isbn_ebook),
    ), per_target)


def publication() -> Column:
    """N18 (/root/reference/convert_starxml_to_bf.py:318-361,457-515):
    bundle_publication a bf:Publication on bf:provisionActivity; bf:date
    from PHIST |o (parsed → YYYY-MM-DD), else the RAW PY text — the
    reference does no validation on the PY fallback ('10/2017' is
    emitted verbatim) and types purely by length (>4 chars → xsd:date
    else xsd:gYear), with simpleDate = first 4 chars; simpleAgent from
    PU |v; simplePlace from PU |o."""
    node = F.concat(B(), F.lit("_publication"))
    phist = date_or_year(subfield(F.col("PHIST"), "o"))
    value = F.coalesce(phist["value"], nullif_empty(F.col("PY")))
    publisher = subfield(F.col("PU"), "v")
    place = subfield(F.col("PU"), "o")
    year = F.substring(value, 1, 4)
    return pack(
        T(B(), NS.BF + "provisionActivity", node, iri=True),
        typ(node, NS.BF + "Publication"),
        T(
            node,
            NS.BF + "date",
            value,
            dtype=F.when(F.length(value) > 4, F.lit(NS.XSD_DATE)).otherwise(
                F.lit(NS.XSD_GYEAR)
            ),
        ),
        T(node, NS.BFLC + "simpleDate", year),
        T(node, NS.BFLC + "simpleAgent", publisher),
        T(node, NS.BFLC + "simplePlace", place),
    )
