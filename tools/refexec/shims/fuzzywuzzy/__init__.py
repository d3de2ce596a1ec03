"""fuzzywuzzy stand-in implementing the public pure-python (difflib)
algorithms of fuzz.ratio / partial_ratio / token_sort_ratio /
token_set_ratio and process.extractOne — the exact functions the
reference calls (grep-verified). Written from the published fuzzywuzzy
source semantics (SeatGeek, MIT), not from this repo's engine code, so
the reference-exec oracle stays independent of the engine."""

from . import fuzz, process  # noqa: F401
