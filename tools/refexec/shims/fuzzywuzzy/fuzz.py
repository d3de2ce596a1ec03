from __future__ import annotations

import re
from difflib import SequenceMatcher

_NON_WORD = re.compile(r"(?u)\W")


def _ascii_only(s: str) -> str:
    return s.encode("ascii", "ignore").decode("ascii")


def full_process(s, force_ascii=False):
    if s is None:
        return ""
    s = str(s)
    if force_ascii:
        s = _ascii_only(s)
    s = _NON_WORD.sub(" ", s)
    return s.lower().strip()


def ratio(s1, s2):
    if s1 is None or s2 is None:
        return 0
    s1, s2 = str(s1), str(s2)
    if not s1 and not s2:
        return 0
    return int(round(100 * SequenceMatcher(None, s1, s2).ratio()))


def partial_ratio(s1, s2):
    """Best partial alignment of the shorter string inside the longer one
    (fuzzywuzzy's matching-blocks walk, 0.995 early-exit included)."""
    if s1 is None or s2 is None:
        return 0
    s1, s2 = str(s1), str(s2)
    if not s1 or not s2:
        return 0
    shorter, longer = (s1, s2) if len(s1) <= len(s2) else (s2, s1)
    blocks = SequenceMatcher(None, shorter, longer).get_matching_blocks()
    scores = []
    for block in blocks:
        long_start = max(block[1] - block[0], 0)
        long_substr = longer[long_start : long_start + len(shorter)]
        m2 = SequenceMatcher(None, shorter, long_substr)
        r = m2.ratio()
        if r > 0.995:
            return 100
        scores.append(r)
    return int(round(100 * max(scores))) if scores else 0


def _sorted_tokens(s, force_ascii):
    return " ".join(sorted(full_process(s, force_ascii=force_ascii).split())).strip()


def token_sort_ratio(s1, s2, force_ascii=True):
    return ratio(_sorted_tokens(s1, force_ascii), _sorted_tokens(s2, force_ascii))


def token_set_ratio(s1, s2, force_ascii=True):
    t1 = set(full_process(s1, force_ascii=force_ascii).split())
    t2 = set(full_process(s2, force_ascii=force_ascii).split())
    inter = " ".join(sorted(t1 & t2))
    diff12 = " ".join(sorted(t1 - t2))
    diff21 = " ".join(sorted(t2 - t1))
    combined_1 = (inter + " " + diff12).strip()
    combined_2 = (inter + " " + diff21).strip()
    inter = inter.strip()
    return max(
        ratio(inter, combined_1),
        ratio(inter, combined_2),
        ratio(combined_1, combined_2),
    )
