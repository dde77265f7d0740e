from .catalog import (  # noqa: F401
    playlist_summary,
    playlist_videos_with_flags,
    video_detail,
)
from .analytics import (  # noqa: F401
    cross_linked_videos,
    per_playlist_stats,
    summary_stats,
    top_channels,
)
from .search import search_titles, search_transcripts  # noqa: F401
