"""Pure-Python AES (FIPS-197) + CBC — DECRYPTION support for AES-encrypted
PDFs (standard security handler /V 4 AESV2, /V 5 AESV3), where no crypto
library is available in the runtime.

Table-based implementation of the public algorithm: S-box / inverse S-box,
key expansion for 128/192/256-bit keys, and the (inv) round transforms.
Throughput is interpreter-bound (~MB/s) — acceptable for the encrypted
slice of a corpus, where the alternative is flagging the rows unreadable.
The encrypt direction exists so tests can build spec-faithful fixtures.
"""

from __future__ import annotations

# -- tables ------------------------------------------------------------------

_SBOX = [0] * 256
_INV_SBOX = [0] * 256


def _init_sbox() -> None:
    # multiplicative inverse in GF(2^8) + affine transform (FIPS-197 §5.1.1)
    p = q = 1
    first = True
    while first or p != 1:
        first = False
        # p *= 3 in GF(2^8)
        p = p ^ ((p << 1) & 0xFF) ^ (0x1B if p & 0x80 else 0)
        # q /= 3 (multiply by 0xF6)
        q ^= (q << 1) & 0xFF
        q ^= (q << 2) & 0xFF
        q ^= (q << 4) & 0xFF
        if q & 0x80:
            q ^= 0x09
        value = q ^ _rotl8(q, 1) ^ _rotl8(q, 2) ^ _rotl8(q, 3) ^ _rotl8(q, 4) ^ 0x63
        _SBOX[p] = value
        _INV_SBOX[value] = p
    _SBOX[0] = 0x63
    _INV_SBOX[0x63] = 0


def _rotl8(x: int, shift: int) -> int:
    return ((x << shift) | (x >> (8 - shift))) & 0xFF


_init_sbox()

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36, 0x6C, 0xD8, 0xAB, 0x4D]


def _xtime(a: int) -> int:
    return ((a << 1) ^ 0x1B) & 0xFF if a & 0x80 else (a << 1)


def _mul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


def _expand_key(key: bytes) -> list[list[int]]:
    nk = len(key) // 4
    assert nk in (4, 6, 8), "AES key must be 128/192/256 bits"
    rounds = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (rounds + 1)):
        temp = list(words[i - 1])
        if i % nk == 0:
            temp = temp[1:] + temp[:1]
            temp = [_SBOX[b] for b in temp]
            temp[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            temp = [_SBOX[b] for b in temp]
        words.append([words[i - nk][j] ^ temp[j] for j in range(4)])
    # round keys as flat 16-byte lists
    return [
        [words[4 * r + c][row] for c in range(4) for row in range(4)]
        for r in range(rounds + 1)
    ]


def _add_round_key(state: list[int], rk: list[int]) -> None:
    for i in range(16):
        state[i] ^= rk[i]


_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def _encrypt_block(block: bytes, round_keys: list[list[int]]) -> bytes:
    state = list(block)
    _add_round_key(state, round_keys[0])
    rounds = len(round_keys) - 1
    for rnd in range(1, rounds):
        state = [_SBOX[state[_SHIFT[i]]] for i in range(16)]  # sub + shift
        mixed = [0] * 16
        for c in range(4):
            a = state[4 * c : 4 * c + 4]
            mixed[4 * c + 0] = _mul(a[0], 2) ^ _mul(a[1], 3) ^ a[2] ^ a[3]
            mixed[4 * c + 1] = a[0] ^ _mul(a[1], 2) ^ _mul(a[2], 3) ^ a[3]
            mixed[4 * c + 2] = a[0] ^ a[1] ^ _mul(a[2], 2) ^ _mul(a[3], 3)
            mixed[4 * c + 3] = _mul(a[0], 3) ^ a[1] ^ a[2] ^ _mul(a[3], 2)
        state = mixed
        _add_round_key(state, round_keys[rnd])
    state = [_SBOX[state[_SHIFT[i]]] for i in range(16)]
    _add_round_key(state, round_keys[rounds])
    return bytes(state)


def _decrypt_block(block: bytes, round_keys: list[list[int]]) -> bytes:
    state = list(block)
    rounds = len(round_keys) - 1
    _add_round_key(state, round_keys[rounds])
    for rnd in range(rounds - 1, 0, -1):
        state = [_INV_SBOX[state[_INV_SHIFT[i]]] for i in range(16)]
        _add_round_key(state, round_keys[rnd])
        mixed = [0] * 16
        for c in range(4):
            a = state[4 * c : 4 * c + 4]
            mixed[4 * c + 0] = _mul(a[0], 14) ^ _mul(a[1], 11) ^ _mul(a[2], 13) ^ _mul(a[3], 9)
            mixed[4 * c + 1] = _mul(a[0], 9) ^ _mul(a[1], 14) ^ _mul(a[2], 11) ^ _mul(a[3], 13)
            mixed[4 * c + 2] = _mul(a[0], 13) ^ _mul(a[1], 9) ^ _mul(a[2], 14) ^ _mul(a[3], 11)
            mixed[4 * c + 3] = _mul(a[0], 11) ^ _mul(a[1], 13) ^ _mul(a[2], 9) ^ _mul(a[3], 14)
        state = mixed
    state = [_INV_SBOX[state[_INV_SHIFT[i]]] for i in range(16)]
    _add_round_key(state, round_keys[0])
    return bytes(state)


# -- CBC (the PDF shapes) ----------------------------------------------------


def cbc_decrypt(key: bytes, data: bytes, *, iv: bytes | None = None, unpad: bool = True) -> bytes | None:
    """AES-CBC decrypt.  PDF streams prefix the 16-byte IV (``iv=None``)
    and pad PKCS#5/7 (``unpad=True``); /V 5 key unwrapping uses a zero IV
    with no padding."""
    if iv is None:
        if len(data) < 16:
            return None
        iv, data = data[:16], data[16:]
    if len(data) % 16 or not data and unpad:
        return None if unpad else b""
    round_keys = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = data[i : i + 16]
        plain = _decrypt_block(block, round_keys)
        out += bytes(p ^ v for p, v in zip(plain, prev))
        prev = block
    if unpad:
        if not out:
            return None
        pad = out[-1]
        if not 1 <= pad <= 16 or len(out) < pad:
            return None
        del out[-pad:]
    return bytes(out)


def cbc_encrypt(key: bytes, data: bytes, iv: bytes, *, pad: bool = True) -> bytes:
    """AES-CBC encrypt with explicit IV (prefixed to the output when
    padding, matching the PDF stream layout) — the fixture-building half."""
    if pad:
        padlen = 16 - (len(data) % 16)
        data = data + bytes([padlen]) * padlen
    round_keys = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        enc = _encrypt_block(block, round_keys)
        out += enc
        prev = enc
    return (iv + bytes(out)) if pad else bytes(out)
