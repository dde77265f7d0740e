"""Scalar column expressions (SURVEY.md §2.8 F1-F17).

Every helper here is a *native Column expression* — zero Python UDFs — so
the whole query surface stays inside whole-stage codegen. Each docstring
cites the reference implementation the semantics come from.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --- F1 ---------------------------------------------------------------
def format_duration(seconds: Column | str) -> Column:
    """Seconds → ``"1h 2m 3s"`` / ``"2m 3s"`` / ``"45s"``; NULL → ``"Unknown"``.

    Parity with ref display.py:195-207 (divmod rendering, hours segment
    only when >0, minutes segment when hours>0 or minutes>0).
    """
    s = _c(seconds)
    h = F.floor(s / 3600)
    m = F.floor((s % 3600) / 60)
    sec = s % 60
    return F.when(s.isNull(), F.lit("Unknown")).otherwise(
        F.concat_ws(
            " ",
            F.when(h > 0, F.concat(h.cast("string"), F.lit("h"))),
            F.when((h > 0) | (m > 0), F.concat(m.cast("string"), F.lit("m"))),
            F.concat(sec.cast("string"), F.lit("s")),
        )
    )


# --- F2 / F3 ----------------------------------------------------------
_VID = r"([A-Za-z0-9_-]{11})"


def extract_video_id(url: Column | str) -> Column:
    """Parse a video id out of ``watch?v=``, ``youtu.be/``, ``embed/`` URLs or
    a bare 11-char id. Parity with ref display.py:209-228 /
    add_transcripts.py:28-47; NULL when nothing matches."""
    u = F.trim(_c(url))
    pats = [
        rf"[?&]v={_VID}",
        rf"youtu\.be/{_VID}",
        rf"embed/{_VID}",
        rf"^{_VID}$",
    ]
    extracted = [F.regexp_extract(u, p, 1) for p in pats]
    return F.nullif(F.coalesce(*[F.nullif(e, F.lit("")) for e in extracted], F.lit("")), F.lit(""))


# --- F4 ---------------------------------------------------------------
#: the four timestamp shapes recognized at ref add_transcripts.py:49-63,
#: collapsed into one alternation.
#: \s spelled out as [ \t\n\x0B\f\r]: the oracle twin embeds this SAME
#: string into DuckDB SQL, and RE2's \s lacks \x0B (vertical tab) while
#: Java's includes it — the explicit class keeps both engines identical.
_WS = r"[ \t\n\x0B\f\r]"
_TS_PATTERNS = (
    r"(\[\d{1,2}:\d{2}(:\d{2})?\]"
    rf"|\d{{1,2}}:\d{{2}}(:\d{{2}})?{_WS}*-{_WS}"
    rf"|(^|\n){_WS}*\d{{1,2}}:\d{{2}}(:\d{{2}})?{_WS}"
    r"|<\d{1,2}:\d{2}(:\d{2})?>)"
)


def has_timestamps(text: Column | str) -> Column:
    """True when transcript text carries ``[MM:SS]``-style timestamps
    (ref add_transcripts.py:49-63)."""
    return _c(text).rlike(_TS_PATTERNS)


# --- F5 ---------------------------------------------------------------
def context_snippet(text: Column | str, query: str, radius: int = 100) -> Column:
    """±``radius``-char window around the first case-insensitive match of
    ``query`` (ref display.py:604-613). NULL text → NULL; no match → ''."""
    t = _c(text)
    pos = F.locate(query.lower(), F.lower(t))  # 1-based; 0 = no match
    start = F.greatest(pos - radius, F.lit(1))
    length = F.lit(len(query) + 2 * radius)
    return F.when(pos > 0, F.substring(t, start, length)).otherwise(F.lit(""))


# --- F6 ---------------------------------------------------------------
def highlight(text: Column | str, query: str, marker: str = "**") -> Column:
    """Wrap every literal occurrence of ``query`` in ``marker`` pairs
    (ref display.py:614-618 ``str.replace(q, f"**{q}**")`` — exact-case,
    literal)."""
    return F.replace(_c(text), F.lit(query), F.lit(f"{marker}{query}{marker}"))


# --- F7 ---------------------------------------------------------------
_FNAME_BAD = r'[\\/*?:"<>|]'


def sanitize_filename(title: Column | str, max_len: int = 100) -> Column:
    """Filesystem-safe name: bad chars → ``_``, truncate, blank → ``untitled``
    (ref export_playlist_transcripts.py:57-64)."""
    cleaned = F.substring(F.regexp_replace(F.trim(_c(title)), _FNAME_BAD, "_"), 1, max_len)
    return F.coalesce(F.nullif(cleaned, F.lit("")), F.lit("untitled"))


# --- F8 ---------------------------------------------------------------
def yyyymmdd_to_date(col: Column | str) -> Column:
    """yt-dlp ``YYYYMMDD`` upload date → DateType (ref youtube_utils.py:76-81);
    malformed input → NULL (ANSI-safe via try_to_timestamp)."""
    return F.try_to_timestamp(_c(col), F.lit("yyyyMMdd")).cast("date")


# --- F9 ---------------------------------------------------------------
ISO_FMT = "yyyy-MM-dd'T'HH:mm:ssXXX"


def iso_parse(col: Column | str) -> Column:
    """Permissive ISO-8601 parse → TimestampType; malformed input → NULL
    (engine-side analogue of the logged-and-skipped isoparse failures at
    ref main_scraper.py:139-140). ``try_to_timestamp`` keeps ANSI mode on
    for the rest of the engine while tolerating bad input here."""
    return F.try_to_timestamp(_c(col))


def iso_format(col: Column | str) -> Column:
    """TimestampType → ISO-8601 string at the export edge
    (ref youtube_utils.py:92 ``datetime.isoformat``)."""
    return F.date_format(_c(col), ISO_FMT)


# --- F12 --------------------------------------------------------------
def format_thousands(col: Column | str) -> Column:
    """``1234567`` → ``"1,234,567"`` (ref display.py:505 ``f"{v:,}"``)."""
    return F.format_number(_c(col), 0)


# --- F13 --------------------------------------------------------------
def display_name(title: Column | str, id_col: Column | str, count: Column | str) -> Column:
    """``"✅ <title>"`` when count>0 else title; blank titles fall back to
    ``"ID: <id>"`` (ref gui_app.py:43-46)."""
    t = F.nullif(F.trim(_c(title)), F.lit(""))
    base = F.coalesce(t, F.concat(F.lit("ID: "), _c(id_col).cast("string")))
    return F.when(_c(count) > 0, F.concat(F.lit("✅ "), base)).otherwise(base)


def python_extract_video_id(url: str | None) -> str | None:
    """Driver-side twin of :func:`extract_video_id` for non-DataFrame call
    sites (file-inbox parsing, CLI args) — same regex set."""
    if not url:
        return None
    url = url.strip()
    for pat in (rf"[?&]v={_VID}", rf"youtu\.be/{_VID}", rf"embed/{_VID}", rf"^{_VID}$"):
        m = re.search(pat, url)
        if m:
            return m.group(1)
    return None
