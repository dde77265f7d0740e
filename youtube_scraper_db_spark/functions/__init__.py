from .scalars import (  # noqa: F401
    context_snippet,
    extract_video_id,
    format_duration,
    format_thousands,
    has_timestamps,
    highlight,
    iso_format,
    iso_parse,
    sanitize_filename,
    yyyymmdd_to_date,
)
