from topomap_tpu.text.tokenizer import MAXLEN, CLIPTokenizer, WordPieceTokenizer
from topomap_tpu.text.fusion import (
    fuse_pad,
    fuse_pad_soft,
    fuse_tokenadd,
    fuse_tokenjoint,
    embfussion_init,
    fuse_embfussion,
    add_style_prefix,
)

__all__ = [
    "MAXLEN",
    "CLIPTokenizer",
    "WordPieceTokenizer",
    "fuse_pad",
    "fuse_pad_soft",
    "fuse_tokenadd",
    "fuse_tokenjoint",
    "embfussion_init",
    "fuse_embfussion",
    "add_style_prefix",
]
