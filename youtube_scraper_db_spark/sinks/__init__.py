"""Export sinks (SURVEY.md §2.1 S14, S15)."""

from .export_json import playlists_nested, write_playlists_json
from .render_text import render_transcript_files, write_transcript_files

__all__ = [
    "playlists_nested",
    "render_transcript_files",
    "write_playlists_json",
    "write_transcript_files",
]
