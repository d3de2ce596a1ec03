"""rapidfuzz stand-in — research_info.py imports `from rapidfuzz import
fuzz` for token_sort_ratio (TESTG lookup, crossref citation checks).
rapidfuzz returns floats in [0, 100]; the ratio kernel here is
difflib-based (2*matches/total), the same public formula."""

from . import fuzz  # noqa: F401
