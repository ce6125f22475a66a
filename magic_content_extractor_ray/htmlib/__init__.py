from .dom import (
    Node, parse, parse_fragment, body_of,
    TAG, TEXT, COMMENT, VOID_TAGS, BLOCK_TAGS, MEDIA_TAGS,
)
from .selectors import compile_selector, find, find_first, matches

__all__ = [
    "Node", "parse", "parse_fragment", "body_of",
    "TAG", "TEXT", "COMMENT", "VOID_TAGS", "BLOCK_TAGS", "MEDIA_TAGS",
    "compile_selector", "find", "find_first", "matches",
]
