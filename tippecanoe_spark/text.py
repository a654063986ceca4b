"""UTF-8 validation and UTF-16-budget truncation (P13).

Reference: text.cpp (check_utf8 :16-60, truncate16 :110-132,
truncate_string), unit-tested at unit.cpp:12-47.  The reference applies
truncate16(…, 256) to tilestats layer names, attribute names and sample
values (mbtiles.cpp:330,851,871) so malformed or oversized web text
can't produce invalid metadata.
"""

from __future__ import annotations

__all__ = ["check_utf8", "truncate16", "truncate_string"]


def check_utf8(s: bytes | str) -> str:
    """'' when valid; else the reference's error message naming the bad
    byte run (text.cpp:16-60)."""
    if isinstance(s, str):
        b = s.encode("utf-8", errors="surrogateescape")
    else:
        b = s
    i = 0
    n = len(b)
    while i < n:
        fail = 0
        c = b[i]
        if c & 0x80:
            if (c & 0xE0) == 0xC0:
                if i + 1 >= n or (b[i + 1] & 0xC0) != 0x80:
                    fail = 2
                else:
                    i += 1
            elif (c & 0xF0) == 0xE0:
                if i + 2 >= n or (b[i + 1] & 0xC0) != 0x80 or (b[i + 2] & 0xC0) != 0x80:
                    fail = 3
                else:
                    i += 2
            elif (c & 0xF8) == 0xF0:
                if (
                    i + 3 >= n
                    or (b[i + 1] & 0xC0) != 0x80
                    or (b[i + 2] & 0xC0) != 0x80
                    or (b[i + 3] & 0xC0) != 0x80
                ):
                    fail = 4
                else:
                    i += 3
            else:
                fail = 1
        if fail:
            run = " ".join(
                f"0x{b[i + j]:02X}" for j in range(fail) if i + j < n
            )
            text = b.decode("utf-8", errors="surrogateescape")
            return f'"{text}" is not valid UTF-8 ({run})'
        i += 1
    return ""


def truncate16(s: str, runes: int) -> str:
    """Truncate to at most ``runes`` UTF-16 code units on a character
    boundary (astral chars count 2 — text.cpp:110-132)."""
    length = 0
    for i, ch in enumerate(s):
        length += 1 if ord(ch) <= 0xFFFF else 2
        if length > runes:
            return s[:i]
    return s


def truncate_string(s: str, bytes_budget: int) -> str:
    """Truncate to at most ``bytes_budget`` UTF-8 BYTES on a character
    boundary (text.cpp truncate_string)."""
    out_len = 0
    for i, ch in enumerate(s):
        nb = len(ch.encode("utf-8"))
        if out_len + nb > bytes_budget:
            return s[:i]
        out_len += nb
    return s
