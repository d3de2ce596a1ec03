"""python-decouple stand-in: config() reads os.environ (the runner sets
RECORDS_FILE/RECORDS_START/... there); unknown keys get a harmless
dummy so module-level f-strings in the reference still format."""

from __future__ import annotations

import os

_UNSET = object()


def config(key, default=_UNSET, cast=None):
    value = os.environ.get(key)
    if value is None:
        value = None if default is _UNSET else default
        if value is None or value is _UNSET:
            value = f"https://offline.invalid/{key.lower()}"
    return cast(value) if cast and value is not None else value
