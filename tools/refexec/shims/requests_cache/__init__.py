"""requests_cache stand-in: CachedSession whose requests always fail
with a 503 and an unparsable body. Every reference lookup function
(modules/local_api_lookups.py, modules/research_info.py crossref tiers,
convert_starxml_to_bf.py funders) checks status_code == 200 and returns
None otherwise, so this forces the deterministic no-API degrade path —
the same contract the engine's offline mode implements."""

from __future__ import annotations


class _FailedResponse:
    status_code = 503
    ok = False
    text = ""
    content = b""

    def json(self):
        raise ValueError("offline stub: no JSON body")


class CachedSession:
    def __init__(self, *args, **kwargs):
        self.auth = None
        self.headers = {}

    def get(self, *args, **kwargs):
        return _FailedResponse()

    def post(self, *args, **kwargs):
        return _FailedResponse()
