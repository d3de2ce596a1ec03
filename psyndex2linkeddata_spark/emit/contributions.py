"""N3/N4 — person & corporate contribution emitters (SURVEY §2.6).

Reference: /root/reference/modules/contributions.py —
generate_bf_contribution_node (:224-257), add_bf_contributor_person
(:261-398), build_affiliation_nodes (:37-222),
add_bf_contributor_corporate_body (:685-762), and the record-local
matchers J9-J12 (:408-682, resolved in emit/normalize.py).

The per-record loop with its shared-graph re-reads becomes one
`flatten(transform(contribs, …))` array expression — all codegen.
The 190-row geonames country table (J16) is inlined as a literal map
(it's static reference data, /root/reference/modules/mappings.py:501-693);
big authorities (ROR) go through real broadcast joins in operators/linking.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, functions as F

from psyndex2linkeddata_spark import namespaces as NS
from psyndex2linkeddata_spark.data.tables import geonames_countries
from psyndex2linkeddata_spark.emit.base import T, frag, pack_arr, subfrag

def W():
    return F.col("work")

def _geo_pairs():
    """casefold-key → (name, gid), first occurrence wins — the reference
    table carries literal duplicate rows (Malawi, Taiwan, Czech Republic)
    and its lookup is first-match (helpers.py:378-382); Spark's
    create_map refuses duplicate keys (mapKeyDedupPolicy=EXCEPTION)."""
    seen = {}
    for name, gid, _iso in geonames_countries:
        seen.setdefault(name.casefold(), (name, gid))
    return seen


def _GEO_NAME():
    return F.create_map(
        *chain.from_iterable(
            (F.lit(k), F.lit(name)) for k, (name, _gid) in _geo_pairs().items()
        )
    )


def _GEO_ID():
    return F.create_map(
        *chain.from_iterable(
            (F.lit(k), F.lit(gid)) for k, (_name, gid) in _geo_pairs().items()
        )
    )


def geonames_name(country: Column) -> Column:
    """J16 canonical name: casefold first-match
    (/root/reference/modules/helpers.py:378-382). The map keys are
    Python-casefolded, so the lookup side folds with casefold_compat
    (lower alone would miss e.g. 'Rußland' → 'russland')."""
    from psyndex2linkeddata_spark.functions.names import casefold_compat

    return _GEO_NAME()[casefold_compat(F.trim(country))]


def geonames_id(country: Column) -> Column:
    from psyndex2linkeddata_spark.functions.names import casefold_compat

    return _GEO_ID()[casefold_compat(F.trim(country))]


def _affiliation_triples(c: Column, cnode: Column, agent: Column) -> Column:
    """build_affiliation_nodes (/root/reference/modules/contributions.py:37-222):

    agent_affiliation1 a mads:Affiliation ← contribution mads:hasAffiliation;
    …_organization a bf:Organization with rdfs:label (ROR id joined later in
    operators/linking); …_address a mads:Address (only with a country) with
    …_country a mads:Country whose label is geonames-improved (graph.set →
    last-wins = we emit only the final value) + _geonamesid a locid:geonames.
    """
    has_any = c["org"].isNotNull() | c["country"].isNotNull()
    aff = F.when(has_any, subfrag(agent, "affiliation1"))
    org = F.when(c["org"].isNotNull(), subfrag(aff, "organization"))
    addr = F.when(c["country"].isNotNull(), subfrag(aff, "address"))
    country_node = subfrag(addr, "country")
    geo_name = geonames_name(c["country"])
    geo_id = geonames_id(c["country"])
    country_label = F.coalesce(geo_name, c["country"])
    geo_node = F.when(geo_id.isNotNull(), subfrag(country_node, "geonamesid"))
    return F.array(
        T(cnode, NS.MADS + "hasAffiliation", aff, iri=True),
        T(aff, NS.RDF_TYPE, NS.MADS + "Affiliation", iri=True),
        T(aff, NS.MADS + "organization", org, iri=True),
        T(org, NS.RDF_TYPE, NS.BF + "Organization", iri=True),
        T(org, NS.RDFS_LABEL, F.when(org.isNotNull(), c["org"])),
        T(aff, NS.MADS + "hasAffiliationAddress", addr, iri=True),
        T(addr, NS.RDF_TYPE, NS.MADS + "Address", iri=True),
        T(addr, NS.MADS + "country", F.when(addr.isNotNull(), country_node), iri=True),
        T(F.when(addr.isNotNull(), country_node), NS.RDF_TYPE, NS.MADS + "Country", iri=True),
        T(F.when(addr.isNotNull(), country_node), NS.RDFS_LABEL, country_label),
        T(F.when(addr.isNotNull(), country_node), NS.BF + "identifiedBy", geo_node, iri=True),
        T(geo_node, NS.RDF_TYPE, NS.LOCID + "geonames", iri=True),
        T(geo_node, NS.RDF + "value", F.when(addr.isNotNull(), geo_id)),
    )


def contributions() -> Column:
    """One contribution per parsed `contribs` element:

    work#contribution{pos} a bf:Contribution (+ bflc:PrimaryContribution at
    pos 1), pxp:contributionPosition (xsd:integer), bf:qualifier
    first/middle/last, bf:role roles:{|f code, default AU, VE→AU,
    RE→IVR/ED — extract_contribution_role, resolved in normalize}
    (graph.set site → single value), agent node _personagent a bf:Person
    (label, schema names, _orcid a locid:orcid, _psychauthorsid a
    pxc:PsychAuthorsID — one node per agent, one rdf:value per matched
    id field: the reference graph.add's values, so several PAUP/ORCID
    fields matching the same agent accumulate) or _orgagent a
    bf:Organization; mads:email mailto IRI on the contribution node.
    """

    def one(c: Column) -> Column:
        cnode = frag(W(), "contribution", c["pos"])
        is_person = c["kind"] == "person"
        agent = F.when(is_person, subfrag(cnode, "personagent")).otherwise(
            subfrag(cnode, "orgagent")
        )
        has_orcid = F.size(c["orcids"]) > 0
        has_paup = F.size(c["paup_ids"]) > 0
        orcid_node = F.when(has_orcid, subfrag(agent, "orcid"))
        paup_node = F.when(has_paup, subfrag(agent, "psychauthorsid"))
        base = F.array(
            T(W(), NS.BF + "contribution", cnode, iri=True),
            T(cnode, NS.RDF_TYPE, NS.BF + "Contribution", iri=True),
            T(
                cnode,
                NS.RDF_TYPE,
                F.when(c["pos"] == 1, F.lit(NS.BFLC + "PrimaryContribution")),
                iri=True,
            ),
            T(cnode, NS.PXP + "contributionPosition", c["pos"], dtype=NS.XSD_INTEGER),
            T(cnode, NS.BF + "qualifier", c["qualifier"]),
            T(cnode, NS.BF + "role", F.concat(F.lit(NS.ROLES), c["role"]), iri=True),
            T(
                cnode,
                NS.MADS + "email",
                F.when(c["email"].isNotNull(), F.concat(F.lit("mailto:"), c["email"])),
                iri=True,
            ),
            T(cnode, NS.BF + "agent", agent, iri=True),
            T(
                agent,
                NS.RDF_TYPE,
                F.when(is_person, F.lit(NS.BF + "Person")).otherwise(
                    F.lit(NS.BF + "Organization")
                ),
                iri=True,
            ),
            T(agent, NS.RDFS_LABEL, c["name"]),
            T(agent, NS.SCHEMA + "familyName", F.when(is_person, c["family"])),
            T(agent, NS.SCHEMA + "givenName", F.when(is_person, c["given"])),
            # ORCID identifier (J10, resolved in normalize)
            T(agent, NS.BF + "identifiedBy", orcid_node, iri=True),
            T(orcid_node, NS.RDF_TYPE, NS.LOCID + "orcid", iri=True),
            # PsychAuthors identifier (J9)
            T(agent, NS.BF + "identifiedBy", paup_node, iri=True),
            T(paup_node, NS.RDF_TYPE, NS.PXC + "PsychAuthorsID", iri=True),
        )
        # one rdf:value per matched id field (reference graph.add)
        id_values = F.concat(
            F.transform(
                c["orcids"], lambda v: T(subfrag(agent, "orcid"), NS.RDF + "value", v)
            ),
            F.transform(
                c["paup_ids"],
                lambda v: T(subfrag(agent, "psychauthorsid"), NS.RDF + "value", v),
            ),
        )
        return F.concat(base, id_values, _affiliation_triples(c, cnode, agent))

    return pack_arr(F.flatten(F.transform(F.col("contribs"), one)))
