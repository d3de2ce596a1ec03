"""Base58 encoding (Bitcoin alphabet) — used by the reduced-persons
converter's URI scheme (convert_reduced_persons.py:110-123: person URIs
are ``p_`` + base58(uuid bytes)).

Public, canonical algorithm (the alphabet drops 0/O/I/l to avoid
confusable characters); this implementation is independently pinned to
the published test vectors in tests/test_reduced_persons_refexec.py
(e.g. b"hello world" → "StV1DL6CwTryKyV"), so the refexec gate's shim
copy (tools/refexec/shims/base58) and this one cannot agree by mere
copy-paste of a shared bug.
"""

from __future__ import annotations

_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


def b58encode(data: bytes) -> str:
    n = int.from_bytes(data, "big")
    out = []
    while n > 0:
        n, r = divmod(n, 58)
        out.append(_ALPHABET[r])
    pad = 0
    for b in data:
        if b == 0:
            pad += 1
        else:
            break
    return "1" * pad + "".join(reversed(out))
