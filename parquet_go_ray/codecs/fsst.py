"""FSST: Fast Static Symbol Table compression for text/html columns.

Implemented from the public FSST paper (Boncz, Neumann, Leis — "FSST:
Fast Random Access String Compression", VLDB 2020). Absent from the
reference (segmentio/parquet-go); required by the north rule for
text/html columns. Not byte-compatible with the C++ libfsst wire format —
round-trip fidelity + compression gain are the contract here.

Scheme: up to 255 symbols of 1..8 bytes, codes 0..254; code 255 is an
escape followed by one literal byte. Encoding replaces greedy
longest-match symbol occurrences with their 1-byte code.

Everything is vectorized:

- symbol matching: 8-byte little-endian windows of the input as uint64,
  masked per symbol length, membership via ``np.searchsorted`` against the
  sorted symbol keys (longest length wins);
- the inherently sequential greedy scan (position i+len(match) depends on
  the match at i) is solved with pointer doubling: build the "next token
  start" function as an array and extract the visited-position path in
  O(log n) vectorized gathers;
- output assembly via cumsum offsets + fancy-index scatter.

Training is a simplified version of the paper's iterative algorithm: at
each round, tokenize a bounded sample with the current table, count token
and adjacent-token-pair substrings, keep the 255 candidates with the
highest apparent gain (frequency × length).
"""

from __future__ import annotations

import numpy as np

from ._util import uvarint_decode, uvarint_encode

ESCAPE = 255
MAX_SYMBOLS = 255
MAX_SYMBOL_LEN = 8
BLOCK = 4096  # tokenization block: matches never cross a block boundary
TRAIN_SAMPLE = 1 << 15  # 32 KiB
TRAIN_ITERS = 4

_U64 = np.uint64

# ---------------------------------------------------------------- native
# Optional C hot loop for the greedy tokenizer (compiled once per host
# with the system compiler, cached under /tmp; sha-keyed so source edits
# invalidate). The numpy implementation below remains the reference and
# the fallback — both produce the same wire format and are
# cross-compatible (tested in tests/test_fsst.py).

_NATIVE: object = None


def _native():
    global _NATIVE
    if _NATIVE is None:
        _NATIVE = _load_native() or False
    return _NATIVE or None


def _native_cache_dir():
    """Per-user 0700 cache dir for the compiled kernel (never a shared,
    predictable world-writable path another local user could pre-seed)."""
    import os
    from pathlib import Path

    base = Path(
        os.environ.get("XDG_CACHE_HOME", str(Path.home() / ".cache"))
    ) / "pgr_native"
    base.mkdir(parents=True, exist_ok=True, mode=0o700)
    st = base.stat()
    if st.st_uid != os.getuid() or (st.st_mode & 0o077):
        import tempfile

        base = Path(tempfile.mkdtemp(prefix="pgr_native_"))
    return base


def _load_native():
    try:
        import ctypes
        import hashlib
        import os
        import subprocess
        from pathlib import Path

        src = Path(__file__).with_name("_fsst_native.c")
        code = src.read_bytes()
        key = hashlib.sha1(code).hexdigest()[:12]
        so = _native_cache_dir() / f"fsst_{key}.so"
        if not so.exists():
            tmp = f"{so}.{os.getpid()}.tmp"
            subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", "-o", tmp, str(src)],
                check=True,
                capture_output=True,
                timeout=60,
            )
            os.replace(tmp, so)
        # never dlopen a file another uid could have planted
        st = os.stat(so)
        if st.st_uid != os.getuid():
            return None
        lib = ctypes.CDLL(str(so))
        lib.fsst_encode.restype = ctypes.c_int
        lib.fsst_decode.restype = ctypes.c_int
        return lib
    except Exception:
        return None


def _windows_u64(buf: np.ndarray) -> np.ndarray:
    """W[i] = uint64 little-endian view of bytes i..i+7 (zero padded)."""
    n = len(buf)
    p = np.zeros(n + MAX_SYMBOL_LEN - 1, dtype=np.uint64)
    p[:n] = buf
    w = p[0:n].copy()
    for k in range(1, MAX_SYMBOL_LEN):
        w |= p[k : n + k] << _U64(8 * k)
    return w


def _sym_key(sym: bytes) -> int:
    """uint64 little-endian key of a symbol (length <= 8)."""
    return int.from_bytes(sym, "little")


def _path_positions(
    step: np.ndarray, n: int, roots: np.ndarray | None = None
) -> np.ndarray:
    """Positions visited when walking pos += step[pos] from each root
    (default: just 0) until the next root or n.

    Pointer doubling: O(log max-segment-length) rounds of vectorized
    gathers. With block roots every BLOCK bytes (and steps that never
    cross a block boundary), the round count drops from log2(n) to
    log2(BLOCK) and all blocks advance in parallel.
    """
    if n == 0:
        return np.empty(0, dtype=np.int64)
    nxt = np.minimum(np.arange(n, dtype=np.int64) + step, n).astype(np.int32)
    if roots is None:
        visited = np.array([0], dtype=np.int32)
    else:
        visited = roots.astype(np.int32)
        # steps never cross a root (caller clamps matches at block
        # boundaries), so every segment's walk lands exactly ON the next
        # root — turn that landing into a sink so each segment's doubling
        # terminates in log2(segment length) rounds instead of log2(n)
        root_mask = np.zeros(n + 1, dtype=bool)
        root_mask[np.minimum(roots, n)] = True
        nxt = np.where(root_mask[nxt], n, nxt).astype(np.int32)
    j = np.append(nxt, n).astype(np.int32)  # sink at n
    # invariant: `visited` holds positions reached after 0..2^k-1 steps
    # from every root and `j` maps a position 2^k steps forward. Path
    # positions are strictly increasing until the sink, so only sink
    # entries (and root collisions) duplicate — one dedup at the end.
    for _ in range(64):
        new = j[visited]
        if new.max() >= n and (new >= n).all():
            break
        visited = np.concatenate((visited, new))
        j = j[j]
    visited = np.unique(visited)
    return visited[visited < n].astype(np.int64)


class SymbolTable:
    __slots__ = (
        "symbols",
        "_lens",
        "_concat",
        "_concat_off",
        "_l1",
        "_l2",
        "_prefix3",
        "_lpm_lo",
        "_lpm_hi",
        "_lpm_code",
        "_lpm_len",
        "_lpm_parent",
        "_lpm_depth",
        "_packed",
        "_lens_u8",
    )

    def __init__(self, symbols: list[bytes]):
        if len(symbols) > MAX_SYMBOLS:
            raise ValueError("too many symbols")
        self.symbols = symbols
        # numpy matcher structures (l1/l2/prefix3/LPM) are built lazily
        # on first _match: the native path never needs them, and the
        # 16 MiB prefix table is the dominant construction cost
        self._l1 = None
        # decoding structures
        self._lens = np.array([len(s) for s in symbols] + [0], dtype=np.int64)
        concat = b"".join(symbols)
        self._concat = np.frombuffer(concat, dtype=np.uint8) if concat else np.empty(0, np.uint8)
        off = np.zeros(len(symbols) + 1, dtype=np.int64)
        np.cumsum(self._lens[:-1], out=off[1:])
        self._concat_off = off
        # native-path tables: 8-byte padded symbol matrix + u8 lengths
        self._packed = np.zeros((MAX_SYMBOLS, 8), dtype=np.uint8)
        self._lens_u8 = np.zeros(MAX_SYMBOLS, dtype=np.uint8)
        for i, s in enumerate(symbols):
            self._packed[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
            self._lens_u8[i] = len(s)

    # ------------------------------------------------------------ wire form
    def serialize(self) -> bytes:
        out = [bytes([len(self.symbols)])]
        out.append(bytes(len(s) for s in self.symbols))
        out.extend(self.symbols)
        return b"".join(out)

    @classmethod
    def deserialize(cls, buf, pos: int = 0) -> tuple["SymbolTable", int]:
        n = buf[pos]
        pos += 1
        lens = list(buf[pos : pos + n])
        pos += n
        symbols = []
        for ln in lens:
            symbols.append(bytes(buf[pos : pos + ln]))
            pos += ln
        return cls(symbols), pos

    # ------------------------------------------------------------ tokenize
    def _build_match_structs(self) -> None:
        symbols = self.symbols
        # direct-addressed tables for 1- and 2-byte symbols (255 = no match)
        self._l1 = np.full(256, 255, dtype=np.uint8)
        self._l2 = np.full(65536, 255, dtype=np.uint8)
        # 3-byte-prefix bitmap for symbols of length >= 3 (match
        # prefilter; 16 MiB direct table, rebuilt from symbols on demand)
        self._prefix3 = np.zeros(1 << 24, dtype=bool)
        # longest-prefix-match structure over big-endian keys for len >= 3:
        # symbol s covers key range [s·00…, s·ff…]; deepest containing range
        # = longest match; parent = nearest enclosing (shorter) symbol.
        longs = sorted(
            ((i, s) for i, s in enumerate(symbols) if len(s) >= 3),
            key=lambda e: (int.from_bytes(e[1].ljust(8, b"\x00"), "big"), len(e[1])),
        )
        m = len(longs)
        self._lpm_lo = np.empty(m, dtype=np.uint64)
        self._lpm_hi = np.empty(m, dtype=np.uint64)
        self._lpm_code = np.empty(m, dtype=np.uint8)
        self._lpm_len = np.empty(m, dtype=np.int8)
        self._lpm_parent = np.full(m, -1, dtype=np.int32)
        stack: list[int] = []
        depth = 0
        for j, (i, s) in enumerate(longs):
            lo = int.from_bytes(s.ljust(8, b"\x00"), "big")
            hi = int.from_bytes(s.ljust(8, b"\xff"), "big")
            self._lpm_lo[j] = lo
            self._lpm_hi[j] = hi
            self._lpm_code[j] = i
            self._lpm_len[j] = len(s)
            while stack and int(self._lpm_hi[stack[-1]]) < lo:
                stack.pop()
            if stack:
                self._lpm_parent[j] = stack[-1]
            stack.append(j)
            depth = max(depth, len(stack))
        self._lpm_depth = depth
        for i, s in enumerate(symbols):
            if len(s) == 1:
                self._l1[s[0]] = i
            elif len(s) == 2:
                self._l2[s[0] | (s[1] << 8)] = i
            else:
                self._prefix3[s[0] | (s[1] << 8) | (s[2] << 16)] = True

    def _match(self, buf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Per position: (best match length [0 = no symbol], symbol code)."""
        if self._l1 is None:
            self._build_match_structs()
        n = len(buf)
        bestlen = np.zeros(n, dtype=np.int8)
        symid = np.zeros(n, dtype=np.uint8)
        if not self.symbols or n == 0:
            return bestlen, symid
        # 2-byte little-endian view at every position
        w16 = buf[: max(n - 1, 0)].astype(np.uint16)
        if n > 1:
            w16 |= buf[1:n].astype(np.uint16) << 8
        # long symbols (>= 3 bytes): prefilter positions by 2-byte prefix,
        # then one longest-prefix-match searchsorted over big-endian keys
        # with parent chaining (laminar prefix ranges: the deepest range
        # containing a window is the longest match)
        if len(self._lpm_lo) and n > 2:
            w24 = w16[: n - 2].astype(np.uint32) | (
                buf[2:n].astype(np.uint32) << 16
            )
            cand = np.nonzero(self._prefix3[w24])[0]
            if len(cand):
                # big-endian 8-byte windows at candidate positions: combine
                # the two aligned uint64 words covering each window (2
                # gathers instead of 8), then byteswap LE -> BE
                npad = ((n + 15) // 8) * 8
                pad8 = np.zeros(npad, dtype=np.uint8)
                pad8[:n] = buf
                u = pad8.view(np.uint64)
                word = cand >> 3
                s = ((cand & 7) << 3).astype(np.uint64)
                lo_w = u[word] >> s
                hi_w = np.where(s > 0, u[word + 1] << (_U64(64) - s), 0)
                w = (lo_w | hi_w).byteswap()
                idx = np.searchsorted(self._lpm_lo, w, side="right").astype(np.int32) - 1
                rem = np.nonzero(idx >= 0)[0]
                cur = idx[rem]
                while len(rem):
                    ln = self._lpm_len[cur]
                    ok = (
                        (w[rem] <= self._lpm_hi[cur])
                        & (cand[rem] + ln <= n)
                        & ((cand[rem] & (BLOCK - 1)) + ln <= BLOCK)
                    )
                    hit = cand[rem[ok]]
                    bestlen[hit] = ln[ok]
                    symid[hit] = self._lpm_code[cur[ok]]
                    parent = self._lpm_parent[cur[~ok]]
                    keep = parent >= 0
                    rem = rem[~ok][keep]
                    cur = parent[keep]
        # 2-byte symbols (not at a block's last byte): gather only at
        # still-unset positions — long matches already cover a large
        # fraction on natural text
        if n > 1:
            unset = np.nonzero(bestlen[: n - 1] == 0)[0]
            c2 = self._l2[w16[unset]]
            sel = (c2 != 255) & ((unset & (BLOCK - 1)) != BLOCK - 1)
            hit = unset[sel]
            bestlen[hit] = 2
            symid[hit] = c2[sel]
        # 1-byte symbols
        unset = np.nonzero(bestlen == 0)[0]
        c1 = self._l1[buf[unset]]
        sel = c1 != 255
        bestlen[unset[sel]] = 1
        symid[unset[sel]] = c1[sel]
        return bestlen, symid

    def tokenize(self, data: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Greedy longest-match tokenization (block-local: tokens never
        cross a BLOCK boundary, making every block an independent
        segment for parallel path extraction).

        Returns (starts, lengths, codes) where codes == ESCAPE marks a
        literal byte token.
        """
        lib = _native()
        if lib is not None and len(data):
            return self._tokenize_via_native(lib, data)
        buf = np.frombuffer(data, dtype=np.uint8)
        n = len(buf)
        bestlen, symid = self._match(buf)
        step = np.maximum(bestlen, 1)
        roots = np.arange(0, n, BLOCK, dtype=np.int64)
        starts = _path_positions(step, n, roots if len(roots) else None)
        lengths = step[starts]
        codes = np.where(bestlen[starts] > 0, symid[starts], ESCAPE).astype(np.uint8)
        return starts, lengths, codes

    def _tokenize_via_native(self, lib, data: bytes):
        """Recover (starts, lengths, codes) from the native encoder's
        stream — used by training so it also runs at native speed."""
        stream = self._encode_native(lib, data)
        n_blocks, pos = uvarint_decode(stream, 0)
        block_lens = np.empty(n_blocks, dtype=np.int64)
        for i in range(n_blocks):
            block_lens[i], pos = uvarint_decode(stream, pos)
        b = np.frombuffer(stream, dtype=np.uint8, offset=pos)
        roots = np.zeros(n_blocks, dtype=np.int64)
        if n_blocks:
            np.cumsum(block_lens[:-1], out=roots[1:])
        step = np.where(b == ESCAPE, 2, 1)
        cstarts = _path_positions(step, len(b), roots if n_blocks else None)
        tok = b[cstarts]
        is_esc = tok == ESCAPE
        in_lens = np.where(
            is_esc, 1, self._lens[np.minimum(tok, len(self.symbols))]
        ).astype(np.int64)
        starts = np.zeros(len(in_lens), dtype=np.int64)
        if len(in_lens) > 1:
            np.cumsum(in_lens[:-1], out=starts[1:])
        return starts, in_lens, tok

    # ------------------------------------------------------------ en/decode
    def encode(self, data: bytes) -> bytes:
        """Code stream: [uvarint n_blocks][uvarint code-bytes per input
        BLOCK]... [codes]. The per-block lengths let decode start a path
        root at every block (log2(block) doubling rounds, all blocks in
        parallel). Uses the native C tokenizer when available."""
        lib = _native()
        if lib is not None:
            return self._encode_native(lib, data)
        starts, lengths, codes = self.tokenize(data)
        buf = np.frombuffer(data, dtype=np.uint8)
        is_esc = codes == ESCAPE
        out_len = np.where(is_esc, 2, 1)
        out_off = np.zeros(len(starts) + 1, dtype=np.int64)
        np.cumsum(out_len, out=out_off[1:])
        out = np.empty(int(out_off[-1]), dtype=np.uint8)
        out[out_off[:-1]] = codes
        esc_pos = out_off[:-1][is_esc]
        out[esc_pos + 1] = buf[starts[is_esc]]
        # per-input-block code lengths (block starts are token starts)
        n = len(buf)
        roots = np.arange(0, n, BLOCK, dtype=np.int64)
        root_tok = np.searchsorted(starts, roots)
        bounds = np.append(out_off[root_tok], out_off[-1])
        block_lens = np.diff(bounds)
        header = [uvarint_encode(len(block_lens))]
        header.extend(uvarint_encode(int(x)) for x in block_lens)
        return b"".join(header) + out.tobytes()

    def _encode_native(self, lib, data: bytes) -> bytes:
        import ctypes

        n = len(data)
        buf = np.frombuffer(data, dtype=np.uint8)
        out = np.empty(2 * n + 16, dtype=np.uint8)
        block_lens = np.empty(n // BLOCK + 2, dtype=np.int64)
        out_len = ctypes.c_int64(0)
        n_blocks = ctypes.c_int64(0)

        def ptr(a):
            return a.ctypes.data_as(ctypes.c_void_p)

        rc = lib.fsst_encode(
            ptr(buf) if n else None,
            ctypes.c_int64(n),
            ptr(self._packed),
            ptr(self._lens_u8),
            ctypes.c_int32(len(self.symbols)),
            ptr(out),
            ctypes.byref(out_len),
            ptr(block_lens),
            ctypes.byref(n_blocks),
        )
        if rc != 0:
            raise RuntimeError(f"native fsst_encode failed rc={rc}")
        nb = int(n_blocks.value)
        header = [uvarint_encode(nb)]
        header.extend(uvarint_encode(int(x)) for x in block_lens[:nb])
        return b"".join(header) + out[: int(out_len.value)].tobytes()

    def _decode_native(self, lib, codes: np.ndarray) -> bytes:
        import ctypes

        n = len(codes)
        out = np.empty(8 * n + 16, dtype=np.uint8)
        out_len = ctypes.c_int64(0)

        def ptr(a):
            return a.ctypes.data_as(ctypes.c_void_p)

        codes = np.ascontiguousarray(codes)
        rc = lib.fsst_decode(
            ptr(codes),
            ctypes.c_int64(n),
            ptr(self._packed),
            ptr(self._lens_u8),
            ctypes.c_int32(len(self.symbols)),
            ptr(out),
            ctypes.c_int64(len(out)),
            ctypes.byref(out_len),
        )
        if rc != 0:
            raise ValueError(f"native fsst_decode failed rc={rc}")
        return out[: int(out_len.value)].tobytes()

    def decode(self, stream: bytes) -> bytes:
        n_blocks, pos = uvarint_decode(stream, 0)
        block_lens = np.empty(n_blocks, dtype=np.int64)
        for i in range(n_blocks):
            block_lens[i], pos = uvarint_decode(stream, pos)
        b = np.frombuffer(stream, dtype=np.uint8, offset=pos)
        n = len(b)
        if n == 0:
            return b""
        lib = _native()
        if lib is not None:
            return self._decode_native(lib, b)
        roots = np.zeros(n_blocks, dtype=np.int64)
        np.cumsum(block_lens[:-1], out=roots[1:])
        step = np.where(b == ESCAPE, 2, 1)
        starts = _path_positions(step, n, roots)
        tok = b[starts]
        is_esc = tok == ESCAPE
        out_len = np.where(is_esc, 1, self._lens[np.minimum(tok, len(self.symbols))])
        # invalid codes (>= len(symbols), not escape) would give length 0;
        # they cannot occur in our own streams.
        out_off = np.zeros(len(starts) + 1, dtype=np.int64)
        np.cumsum(out_len, out=out_off[1:])
        out = np.empty(int(out_off[-1]), dtype=np.uint8)
        # escapes: literal byte
        out[out_off[:-1][is_esc]] = b[np.minimum(starts[is_esc] + 1, n - 1)]
        # symbols: gather from the concatenated symbol buffer
        sym_mask = ~is_esc
        if sym_mask.any():
            s_codes = tok[sym_mask].astype(np.int64)
            s_lens = self._lens[s_codes]
            total = int(s_lens.sum())
            src = np.repeat(self._concat_off[s_codes], s_lens) + (
                np.arange(total, dtype=np.int64)
                - np.repeat(np.cumsum(s_lens) - s_lens, s_lens)
            )
            dst = np.repeat(out_off[:-1][sym_mask], s_lens) + (
                np.arange(total, dtype=np.int64)
                - np.repeat(np.cumsum(s_lens) - s_lens, s_lens)
            )
            out[dst] = self._concat[src]
        return out.tobytes()


def train(data: bytes, max_symbols: int = MAX_SYMBOLS, iters: int = TRAIN_ITERS) -> SymbolTable:
    """Train a symbol table on (a bounded sample of) data."""
    sample = data[:TRAIN_SAMPLE]
    buf = np.frombuffer(sample, dtype=np.uint8)
    n = len(buf)
    if n == 0:
        return SymbolTable([])
    table = SymbolTable([])
    w = _windows_u64(buf.astype(np.uint64))
    for _ in range(iters):
        starts, lengths, _codes = table.tokenize(sample)
        # candidate substrings: every token, and every adjacent token pair
        # (pairs are contiguous substrings of the sample)
        cand_starts = [starts, starts[:-1]]
        pair_len = lengths[:-1] + lengths[1:]
        cand_lens = [lengths, pair_len]
        starts_all = np.concatenate(cand_starts)
        lens_all = np.concatenate(cand_lens)
        ok = (lens_all <= MAX_SYMBOL_LEN) & (starts_all + lens_all <= n)
        starts_all, lens_all = starts_all[ok], lens_all[ok]
        # key = masked 8-byte window + length → a (key, len) composite
        keys = w[starts_all]
        shift = (_U64(64) - lens_all.astype(np.uint64) * _U64(8)).astype(np.uint64)
        keys = np.where(
            lens_all == 8, keys, (keys << shift) >> shift
        )
        # count (key, len) pairs via one lexsort + run-length scan
        lens_u = lens_all.astype(np.uint64)
        order0 = np.lexsort((lens_u, keys))
        k_s, l_s = keys[order0], lens_u[order0]
        if len(k_s) == 0:
            return table
        change = np.concatenate(
            ([True], (k_s[1:] != k_s[:-1]) | (l_s[1:] != l_s[:-1]))
        )
        starts_u = np.nonzero(change)[0]
        counts = np.diff(np.concatenate((starts_u, [len(k_s)])))
        ukeys, ulens = k_s[starts_u], l_s[starts_u]
        gain = (counts * ulens).astype(np.int64)
        order = np.lexsort((ulens, ukeys, -gain))
        top = order[:max_symbols]
        symbols = [
            int(ukeys[i]).to_bytes(8, "little")[: int(ulens[i])] for i in top
        ]
        table = SymbolTable(symbols)
    return table


# ------------------------------------------------------- byte-array codec


def encode_byte_array(
    data: bytes, offsets: np.ndarray, table: SymbolTable | None = None
) -> bytes:
    """FSST codec for a string/binary column chunk.

    Layout: [symbol table][uvarint len(lengths_block)][DELTA_BINARY_PACKED
    int32 value lengths][uvarint n_codes][FSST code stream]. The whole
    concatenated value buffer is compressed as one stream (symbol matches
    may span value boundaries; decode reconstructs the exact buffer and
    re-splits at offsets). Pass `table` to reuse a trained symbol table
    (e.g. the codec selector's trial table) instead of retraining.
    """
    from . import delta

    if table is None:
        table = train(bytes(data))
    codes = table.encode(bytes(data))
    lengths = np.diff(np.asarray(offsets, dtype=np.int64)).astype(np.int32)
    lblock = delta.encode_binary_packed(lengths, 32)
    return (
        table.serialize()
        + uvarint_encode(len(lblock))
        + lblock
        + uvarint_encode(len(codes))
        + codes
    )


def decode_byte_array(buf: bytes) -> tuple[bytes, np.ndarray]:
    from . import delta

    table, pos = SymbolTable.deserialize(buf, 0)
    blen, pos = uvarint_decode(buf, pos)
    lengths, _ = decode_lengths(buf, pos, blen)
    pos += blen
    clen, pos = uvarint_decode(buf, pos)
    data = table.decode(bytes(buf[pos : pos + clen]))
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return data, offsets


def decode_lengths(buf, pos, blen):
    from . import delta

    return delta.decode_binary_packed(bytes(buf[pos : pos + blen]), 32)
