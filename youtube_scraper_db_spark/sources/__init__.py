"""Semi-structured sources (SURVEY.md §2.1 S2, S4, S9; §2.7 E3)."""

from .html_playlists import extract_playlist_ids
from .playlists_json import read_playlists_json
from .transcript_files import parse_transcript_text, read_transcript_files

__all__ = [
    "extract_playlist_ids",
    "parse_transcript_text",
    "read_playlists_json",
    "read_transcript_files",
]
