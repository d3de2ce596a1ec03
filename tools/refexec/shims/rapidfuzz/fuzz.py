from __future__ import annotations

import re
from difflib import SequenceMatcher

_NON_WORD = re.compile(r"(?u)\W")


def ratio(s1, s2, **kwargs):
    if s1 is None or s2 is None:
        return 0.0
    s1, s2 = str(s1), str(s2)
    if not s1 and not s2:
        return 100.0
    if not s1 or not s2:
        return 0.0
    return 100.0 * SequenceMatcher(None, s1, s2).ratio()


def _sorted_tokens(s):
    s = _NON_WORD.sub(" ", str(s)).lower().strip()
    return " ".join(sorted(s.split()))


def token_sort_ratio(s1, s2, **kwargs):
    if s1 is None or s2 is None:
        return 0.0
    return ratio(_sorted_tokens(s1), _sorted_tokens(s2))


def partial_ratio(s1, s2, **kwargs):
    if s1 is None or s2 is None:
        return 0.0
    s1, s2 = str(s1), str(s2)
    if not s1 or not s2:
        return 0.0
    shorter, longer = (s1, s2) if len(s1) <= len(s2) else (s2, s1)
    blocks = SequenceMatcher(None, shorter, longer).get_matching_blocks()
    best = 0.0
    for block in blocks:
        start = max(block[1] - block[0], 0)
        window = longer[start : start + len(shorter)]
        best = max(best, SequenceMatcher(None, shorter, window).ratio())
    return 100.0 * best
