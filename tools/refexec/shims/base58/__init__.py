"""base58 stand-in for the one call the reduced-persons converter makes
(convert_reduced_persons.py:117: ``base58.b58encode(uuid.bytes)
.decode("utf-8")``). Independent implementation from the engine's
functions/base58.py; both are pinned to published test vectors in
tests/test_reduced_persons_refexec.py."""

from __future__ import annotations

_ALPHABET = b"123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


def b58encode(data: bytes) -> bytes:
    if isinstance(data, str):
        data = data.encode("utf-8")
    pad = len(data) - len(data.lstrip(b"\x00"))
    n = int.from_bytes(data, "big")
    digits = bytearray()
    while n > 0:
        n, r = divmod(n, 58)
        digits.append(_ALPHABET[r])
    digits.extend(b"1" * pad)
    digits.reverse()
    return bytes(digits)
