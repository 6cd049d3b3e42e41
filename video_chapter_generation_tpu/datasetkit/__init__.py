"""Dataset acquisition & preparation kit (offline, host-side).

Parsing utilities, clip flattening, dataset splits and (gated) scraping
helpers mirroring the reference's `video_chapter_youtube_dataset/` project.
"""

from .parsing import (
    TIMESTAMP_DELIMITER,
    clean_str,
    extract_first_timestamp,
    extract_timestamp,
    parse_csv_to_list,
    parse_timestamp_lines,
    remove_timestamp,
    text_decontracted,
)

__all__ = [
    "TIMESTAMP_DELIMITER",
    "clean_str",
    "extract_first_timestamp",
    "extract_timestamp",
    "parse_csv_to_list",
    "parse_timestamp_lines",
    "remove_timestamp",
    "text_decontracted",
]
