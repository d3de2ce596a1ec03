"""N7/N8 — funding references and conference references (SURVEY §2.6).

Reference: /root/reference/convert_starxml_to_bf.py — get_bf_grants
(:943-1066, incl. P10 noise skip :948-951, F21 grant-number split :792-811)
and get_bf_conferences (:1072-1168, gated on BE ∈ {SS,SM} per P9).

Counters are source-position based (enumerate → index+1): a skipped noise
GRANT still consumes its number — mirrored here by numbering before the
noise filter. The FundRef DOI (J3) joins in via plans/pipeline (broadcast
authority), keyed on the F28-canonicalized funder name.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from psyndex2linkeddata_spark import namespaces as NS
from psyndex2linkeddata_spark.emit.base import T, cleaned, mainfield, pack_arr, subfield, subfrag, typ
from psyndex2linkeddata_spark.functions.grants import (
    is_grant_noise,
    split_grant_numbers,
)

def W():
    return F.col("work")

RELATORS = "http://id.loc.gov/vocabulary/relators/"


def funding_ref_node(n: Column) -> Column:
    return F.concat(W(), F.lit("#fundingreference"), n.cast("string"))


def funding() -> Column:
    def one(s: Column, i: Column) -> Column:
        field = cleaned(F.trim(s))
        noise = is_grant_noise(field)
        fr = F.when(~noise, funding_ref_node(i + 1))
        funder = subfrag(fr, "funder")
        name = F.coalesce(mainfield(s), F.lit("unknown funder"))
        info = subfield(s, "i")
        recipient = subfield(s, "e")
        note_text = F.when(
            recipient.isNotNull() & info.isNotNull(),
            F.concat(info, F.lit(". Recipient(s): "), recipient),
        ).when(
            recipient.isNotNull(), F.concat(F.lit("Recipient(s): "), recipient)
        ).otherwise(info)
        note_node = F.when(note_text.isNotNull(), subfrag(fr, "note"))

        base = F.array(
            typ(fr, NS.PXC + "FundingReference"),
            typ(funder, NS.BF + "Agent"),
            typ(funder, NS.PXC + "Funder"),
            T(fr, NS.BF + "agent", funder, iri=True),
            T(fr, NS.BF + "role", RELATORS + "spn", iri=True),
            T(funder, NS.RDFS_LABEL, F.when(fr.isNotNull(), name)),
            T(note_node, NS.RDF_TYPE, NS.BF + "Note", iri=True),
            T(note_node, NS.RDFS_LABEL, note_text),
            T(fr, NS.BF + "note", note_node, iri=True),
            T(W(), NS.BF + "contribution", fr, iri=True),
        )
        grant_ids = split_grant_numbers(F.coalesce(subfield(s, "n"), F.lit("")))

        def one_grant(g: Column, gi: Column) -> Column:
            gnode = F.concat(fr, F.lit("_grant"), (gi + 1).cast("string"))
            award = F.concat(gnode, F.lit("_awardnumber"))
            return F.array(
                typ(gnode, NS.PXC + "Grant"),
                T(fr, NS.PXP + "grant", gnode, iri=True),
                typ(award, NS.PXC + "GrantId"),
                T(award, NS.RDF + "value", F.trim(g)),
                T(gnode, NS.BF + "identifiedBy", award, iri=True),
            )

        return F.concat(base, F.flatten(F.transform(grant_ids, one_grant)))

    return pack_arr(
        F.flatten(F.transform(F.coalesce(F.col("GRANT"), F.array()), one))
    )


def conferences() -> Column:
    def one(s: Column, i: Column) -> Column:
        field = cleaned(F.trim(s))
        name = F.coalesce(mainfield(s), F.lit("MISSING CONFERENCE NAME"))
        date = subfield(s, "d")
        place = subfield(s, "o")
        extra = subfield(s, "b")
        year = F.when(
            date.isNotNull() & (F.length(F.regexp_extract(date, r"\d{4}", 0)) > 0),
            F.regexp_extract(date, r"\d{4}", 0),
        )
        note = F.when(date.isNotNull(), F.concat(F.lit("Date(s): "), date))
        note = F.when(
            note.isNotNull() & extra.isNotNull(), F.concat(note, F.lit(". "), extra)
        ).otherwise(note)
        cr = F.concat(W(), F.lit("#conferencereference"), (i + 1).cast("string"))
        meeting = subfrag(cr, "meeting")
        note_node = F.when(note.isNotNull(), subfrag(cr, "note"))
        return F.array(
            typ(cr, NS.PXC + "ConferenceReference"),
            typ(meeting, NS.BF + "Meeting"),
            T(cr, NS.BF + "agent", meeting, iri=True),
            T(meeting, NS.RDFS_LABEL, name),
            T(meeting, NS.BFLC + "simpleDate", year),
            T(meeting, NS.BFLC + "simplePlace", place),
            T(note_node, NS.RDF_TYPE, NS.BF + "Note", iri=True),
            T(note_node, NS.RDFS_LABEL, note),
            # the reference hangs the note onto the reference node
            # (helpers.build_note_node: resource bf:note _note)
            T(cr, NS.BF + "note", note_node, iri=True),
            T(cr, NS.BF + "role", RELATORS + "ctb", iri=True),
            T(W(), NS.BF + "contribution", cr, iri=True),
        )

    gated = F.when(
        F.col("BE").isin("SS", "SM"), F.coalesce(F.col("CF"), F.array())
    ).otherwise(F.array())
    return pack_arr(F.flatten(F.transform(gated, one)))
