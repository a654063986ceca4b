"""Reference-faithful CSV primitives shared by the geocsv source and
tile-join's CSV attribute join (csv.cpp:5-113 semantics).

- :func:`csv_split` — comma split honoring embedded quotes, skipping
  whitespace AFTER each comma, stopping at CR/LF (csv.cpp:5-39: the
  Windows-line-endings case in tests/join-population/windows.csv rides
  on the CR stop).
- :func:`csv_dequote` — strip quote chars, `""` → `"` (csv.cpp:41-53).
- :func:`csv_is_number` — JSON number rules (csv.cpp:113-174): no
  leading zeros ("060014201001000" is a STRING — this is what keeps
  census GEOID keys joinable), no leading '+'/whitespace, optional
  fraction and exponent.
- :func:`read_join_csv` — the in-memory key→row map tile-join builds
  (csv.cpp:67-111 readcsv): header dequoted, each row's KEY dequoted
  (other fields keep their quotes for the quoted-string-stays-string
  typing rule in tile-join.cpp:236-239), FIRST occurrence of a key wins
  (std::map::insert does not overwrite).
"""

from __future__ import annotations

import re

_NUM_RE = re.compile(r"-?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-]?[0-9]+)?\Z")


def csv_is_number(s: str) -> bool:
    return bool(_NUM_RE.match(s))


def csv_dequote(s: str) -> str:
    out = []
    i = 0
    n = len(s)
    while i < n:
        if s[i] == '"':
            if i + 1 < n and s[i + 1] == '"':
                out.append('"')
            i += 1
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def csv_split(s: str) -> list[str]:
    """One raw line (terminator included or not) → fields."""
    ret: list[str] = []
    i = 0
    n = len(s)
    while i < n and s[i] not in "\r\n":
        start = i
        within = False
        while i < n and s[i] not in "\r\n":
            if s[i] == '"':
                within = not within
            if s[i] == "," and not within:
                break
            i += 1
        ret.append(s[start:i])
        if i < n and s[i] == ",":
            i += 1
            while i < n and s[i].isspace():
                i += 1
            if i >= n or s[i] in "\r\n":
                ret.append("")
                break
    return ret


def read_join_csv(path: str) -> tuple[list[str], dict[str, list[str]]]:
    """tile-join -c: (header, key→row fields).  The key (field 0) is
    dequoted; other fields keep quotes so the join typing rule can see
    them; duplicate keys keep the FIRST row."""
    header: list[str] = []
    mapping: dict[str, list[str]] = {}
    with open(path, encoding="utf-8") as fh:
        first = fh.readline()
        if first:
            header = [csv_dequote(h) for h in csv_split(first)]
        for line in fh:
            if not line:
                continue
            fields = csv_split(line)
            if fields:
                fields[0] = csv_dequote(fields[0])
                mapping.setdefault(fields[0], fields)
    return header, mapping
