"""Content addressing: base58btc-encoded SHA2-256 multihash.

Behavioral equivalent of the reference's body hash (lib/resource.go:113-115:
``multihash.Sum(body, SHA2_256)`` then base58 encode) — the content address
under which bodies are archived (lib/resource_handler.go:104-106).
Independent implementation from the public multihash/base58btc specs.
"""

from __future__ import annotations

import hashlib

_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


def base58btc(data: bytes) -> str:
    """Base58 (bitcoin alphabet) encode."""
    n = int.from_bytes(data, "big")
    out = []
    while n > 0:
        n, rem = divmod(n, 58)
        out.append(_B58_ALPHABET[rem])
    # preserve leading zero bytes as '1'
    pad = 0
    for b in data:
        if b == 0:
            pad += 1
        else:
            break
    return "1" * pad + "".join(reversed(out))


def multihash_sha256_b58(body: bytes | None) -> str:
    """sha2-256 multihash (0x12 code, 0x20 length prefix), base58btc."""
    if body is None:
        return ""
    digest = hashlib.sha256(bytes(body)).digest()
    return base58btc(b"\x12\x20" + digest)
