"""strftime → Spark/Java time-pattern translation.

The reference's sink args use C strftime: ``filename_prefix`` (default
``%Y/%m/%d``) partitions the sink buffers (``/root/reference/execute/
sinkNode.go:63-102``) and ``filename_format`` (default ``%s.log``, i.e.
epoch seconds) names each flushed file after the LAST event's timestamp
(``sinkNode.go:190-225``, strftime.WithUnixSeconds('s')). Spark's
``date_format`` speaks Java ``DateTimeFormatter`` patterns, so DSL args
must be translated before they reach a writer; ``%s`` has no Java
pattern at all and is rendered via ``unix_timestamp``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# strftime directive → Java DateTimeFormatter pattern
_STRFTIME_TO_JAVA = {
    "Y": "yyyy",
    "y": "yy",
    "m": "MM",
    "d": "dd",
    "H": "HH",
    "I": "hh",
    "M": "mm",
    "S": "ss",
    "f": "SSSSSS",
    "j": "DDD",
    "p": "a",
    "A": "EEEE",
    "a": "EEE",
    "B": "MMMM",
    "b": "MMM",
}


def _quote_literal(text: str) -> str:
    """Quote literal text for a Java time pattern (letters are pattern
    chars; single quotes escape)."""
    if not text:
        return ""
    if any(c.isalpha() or c == "'" for c in text):
        return "'" + text.replace("'", "''") + "'"
    return text


def strftime_to_java(fmt: str) -> str:
    """Translate a strftime format with NO ``%s`` directive to a Java
    pattern. Unknown directives fail loudly (silent mistranslation would
    corrupt every output path)."""
    out: list[str] = []
    lit: list[str] = []
    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c == "%":
            if i + 1 >= len(fmt):
                raise ValueError(f"dangling %% in strftime format {fmt!r}")
            d = fmt[i + 1]
            if d == "%":
                lit.append("%")
            elif d == "s":
                raise ValueError(
                    "%s (epoch seconds) has no Java pattern; use ts_strftime_column"
                )
            elif d in _STRFTIME_TO_JAVA:
                out.append(_quote_literal("".join(lit)))
                lit = []
                out.append(_STRFTIME_TO_JAVA[d])
            else:
                raise ValueError(f"unsupported strftime directive %{d} in {fmt!r}")
            i += 2
        else:
            lit.append(c)
            i += 1
    out.append(_quote_literal("".join(lit)))
    return "".join(out)


def ts_strftime_column(ts: Column, fmt: str) -> Column:
    """Format a timestamp Column with a strftime format, including
    ``%s`` (epoch seconds — the reference's default filename). Null ts
    ⇒ null (callers coalesce to their fallback name, the analog of the
    reference's UUID fallback)."""
    segments = fmt.split("%s")
    # guard: "%%s" is a literal "%s", not epoch seconds — rare enough to
    # reject rather than mis-render
    if "%%" in fmt and "s" in fmt:
        for seg in segments[:-1]:
            if seg.endswith("%"):
                raise ValueError(f"ambiguous %%s sequence in {fmt!r}")
    parts: list[Column] = []
    for i, seg in enumerate(segments):
        if seg:
            parts.append(F.date_format(ts, strftime_to_java(seg)))
        if i < len(segments) - 1:
            parts.append(F.unix_timestamp(ts).cast("string"))
    if not parts:
        return F.lit("")
    return parts[0] if len(parts) == 1 else F.concat(*parts)
