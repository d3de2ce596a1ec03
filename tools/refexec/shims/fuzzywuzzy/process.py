from __future__ import annotations

from . import fuzz


def extract(query, choices, scorer=None, limit=5, processor=None):
    scorer = scorer or fuzz.token_sort_ratio
    results = []
    for choice in choices:
        text = processor(choice) if processor else choice
        results.append((choice, scorer(query, text)))
    results.sort(key=lambda x: x[1], reverse=True)
    return results[:limit]


def extractOne(query, choices, scorer=None, processor=None, score_cutoff=0):
    best = extract(query, choices, scorer=scorer, limit=1, processor=processor)
    if best and best[0][1] >= score_cutoff:
        return best[0]
    return None
