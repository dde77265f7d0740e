"""End-to-end pipelines composing the operator library (SURVEY.md §3)."""

from .refresh import RefreshResult, fetch_stage, refresh_playlists, stale_work_set

__all__ = ["RefreshResult", "fetch_stage", "refresh_playlists", "stale_work_set"]
