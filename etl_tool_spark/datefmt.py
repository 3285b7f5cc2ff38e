"""Go reference-time layout → JVM DateTimeFormatter pattern converter.

The reference's date transforms take Go layouts like ``2006-01-02 15:04:05``
(internal/transform/transform.go:311-405); Spark's ``to_timestamp`` /
``date_format`` take JVM patterns (``yyyy-MM-dd HH:mm:ss``). This module
translates between the two, longest-token-first, and exposes the
reference's 11-layout fallback chain (transform.go:339-343) pre-translated.
"""

from __future__ import annotations

__all__ = ["go_layout_to_jvm", "FALLBACK_GO_LAYOUTS", "FALLBACK_JVM_PATTERNS",
           "RFC3339_GO", "RFC3339_JVM"]

# Ordered longest-first so e.g. "2006" wins over "06", "Jan" over "1".
_GO_TO_JVM: list[tuple[str, str]] = [
    ("2006", "yyyy"),
    ("January", "MMMM"),
    ("Jan", "MMM"),
    ("Monday", "EEEE"),
    ("Mon", "EEE"),
    (".000000000", ".SSSSSSSSS"),
    (".000000", ".SSSSSS"),
    (".000", ".SSS"),
    (".999999999", "[.SSSSSSSSS]"),
    (".999999", "[.SSSSSS]"),
    (".999", "[.SSS]"),
    ("15", "HH"),
    ("03", "hh"),
    ("04", "mm"),
    ("05", "ss"),
    ("06", "yy"),
    ("01", "MM"),
    ("02", "dd"),
    ("_2", "d"),
    ("Z07:00", "XXX"),
    ("Z0700", "XX"),
    ("-07:00", "xxx"),
    ("-0700", "xx"),
    ("-07", "x"),
    ("MST", "zzz"),
    ("PM", "a"),
    ("pm", "a"),
    ("1", "M"),
    ("2", "d"),
    ("3", "h"),
    ("4", "m"),
    ("5", "s"),
]

# Every ASCII letter is reserved in JVM DateTimeFormatter patterns — any
# letter not produced by a token must be quoted.
_NEEDS_QUOTE = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")


def go_layout_to_jvm(layout: str) -> str:
    """Translate a Go time layout to an equivalent JVM datetime pattern."""
    out: list[str] = []
    i = 0
    n = len(layout)
    while i < n:
        for go_tok, jvm_tok in _GO_TO_JVM:
            if layout.startswith(go_tok, i):
                out.append(jvm_tok)
                i += len(go_tok)
                break
        else:
            ch = layout[i]
            if ch in _NEEDS_QUOTE:
                out.append(f"'{ch}'")
            elif ch == "'":
                out.append("''")
            else:
                out.append(ch)
            i += 1
    return "".join(out)


RFC3339_GO = "2006-01-02T15:04:05Z07:00"
RFC3339_JVM = go_layout_to_jvm(RFC3339_GO)  # yyyy-MM-dd'T'HH:mm:ssXXX

# The reference's fallback chain when no inputFormat is given
# (transform.go:339-343): common date layouts tried in order.
FALLBACK_GO_LAYOUTS: list[str] = [
    "2006-01-02",
    "2006/01/02",
    "01/02/2006",
    "2006-01-02T15:04:05Z07:00",
    "2006-01-02 15:04:05",
    "Mon, 02 Jan 2006 15:04:05 -0700",   # RFC1123Z
    "Mon, 02 Jan 2006 15:04:05 MST",     # RFC1123
    "02 Jan 06 15:04 -0700",             # RFC822Z
    "02 Jan 06 15:04 MST",               # RFC822
    "01-02-06",
    "20060102",
]

FALLBACK_JVM_PATTERNS: list[str] = [go_layout_to_jvm(fmt) for fmt in FALLBACK_GO_LAYOUTS]


def parse_candidates(jvm_pattern: str) -> tuple[str | None, str]:
    """Spark's CORRECTED-mode parser rejects day-of-week ('E') in parse
    patterns. For patterns carrying a leading 'EEE, ' (the RFC1123/822
    fallbacks) return (strip_regex, pattern_without_weekday): the caller
    regexp_replaces the input before try_to_timestamp. The weekday is
    redundant for the point-in-time anyway."""
    if jvm_pattern.startswith("EEE, "):
        return (r"^[A-Za-z]{3}, ", jvm_pattern[len("EEE, "):])
    return (None, jvm_pattern)
