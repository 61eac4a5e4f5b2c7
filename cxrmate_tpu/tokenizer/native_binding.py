"""ctypes binding for the native BPE encoder.

``attach(tokenizer)`` compiles (or reuses) the shared library and plugs a native
``encode`` into a :class:`ByteLevelBPETokenizer`. Vocab tokens are translated from
the GPT-2 printable-unicode alphabet back to raw bytes so the C++ engine works on
byte strings directly. Any failure (no g++, unsupported platform) leaves the
pure-Python path in place."""

from __future__ import annotations

import ctypes
from typing import List, Optional

import numpy as np

from cxrmate_tpu.tokenizer.bpe import ByteLevelBPETokenizer, unicode_to_bytes


class _NativeBPE:
    def __init__(self, lib, handle, tokenizer: ByteLevelBPETokenizer):
        self._lib = lib
        self._handle = handle
        self._tok = tokenizer
        self._buf = np.empty(1 << 16, dtype=np.int32)

    def encode_piece(self, piece_bytes: bytes) -> List[int]:
        n = self._lib.bpe_encode(
            self._handle, piece_bytes, len(piece_bytes),
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), self._buf.size,
        )
        if n > self._buf.size:
            self._buf = np.empty(n, dtype=np.int32)
            n = self._lib.bpe_encode(
                self._handle, piece_bytes, len(piece_bytes),
                self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), self._buf.size,
            )
        return self._buf[:n].tolist()

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for piece, is_special in self._tok._split_on_specials(text):
            if is_special:
                ids.append(self._tok.vocab[piece])
            else:
                ids.extend(self.encode_piece(piece.encode("utf-8")))
        return ids

    def __del__(self):
        try:
            self._lib.bpe_free(self._handle)
        except Exception:
            pass


def _token_to_bytes(token: str) -> bytes:
    u2b = unicode_to_bytes()
    out = bytearray()
    for ch in token:
        b = u2b.get(ch)
        if b is None:
            return token.encode("utf-8")  # non-byte-level token (shouldn't happen)
        out.append(b)
    return bytes(out)


def attach(tokenizer: ByteLevelBPETokenizer) -> Optional[_NativeBPE]:
    """Build + attach the native encoder; returns the binding or None on failure."""
    try:
        from cxrmate_tpu.tokenizer.native.build import build

        so_path = build()
        lib = ctypes.CDLL(so_path)
    except Exception:
        return None
    lib.bpe_create.restype = ctypes.c_void_p
    lib.bpe_create.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
    ]
    lib.bpe_encode.restype = ctypes.c_int32
    lib.bpe_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ]
    lib.bpe_free.argtypes = [ctypes.c_void_p]

    specials = set(tokenizer.all_special_tokens)
    entries = [(t, i) for t, i in tokenizer.vocab.items() if t not in specials]
    blob = bytearray()
    ids = np.empty(len(entries), dtype=np.int32)
    for row, (tok, idx) in enumerate(entries):
        raw = _token_to_bytes(tok)
        blob += len(raw).to_bytes(4, "little")
        blob += raw
        ids[row] = idx
    merge_ids = np.empty((len(tokenizer.merges), 2), dtype=np.int32)
    for r, (a, b) in enumerate(tokenizer.merges):
        merge_ids[r, 0] = tokenizer.vocab[a]
        merge_ids[r, 1] = tokenizer.vocab[b]
    # unk_id < 0 selects the engine's drop-unknown-bytes mode (HF BPE with
    # model unk_token null — the reference recipe); >= 0 maps them to unk
    unk = -1
    if tokenizer.unk_token is not None:
        unk = tokenizer.vocab.get(tokenizer.unk_token, -1)
    handle = lib.bpe_create(
        bytes(blob), len(blob),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(entries),
        merge_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(tokenizer.merges),
        unk,
    )
    if not handle:
        return None
    native = _NativeBPE(lib, ctypes.c_void_p(handle), tokenizer)
    tokenizer.attach_native(native)
    return native
