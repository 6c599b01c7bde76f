"""Pure-Python Zstandard codec: full RFC 8878 DEcompressor + raw-block
COMpressor (spec-direct, zero dependencies).

The reference ships zstd end-to-end (Vector: `src/sinks/util/buffer/
compression.rs` Zstd variant; `lib/codecs` decoder stack). No zstandard
wheel exists in this sandbox, but the format is public (RFC 8878), so —
same policy as the dnstap/netflow/mmdb byte walkers — the codec carries
its own decoder: frame parsing, raw/RLE/compressed blocks, FSE table
description + interleaved-state decoding, canonical Huffman literals
(1- and 4-stream, direct or FSE-compressed weights, treeless repeat),
sequences with predefined/RLE/FSE/repeat modes, the three-slot repeat-
offset machine (including the literals_length==0 swaps), and the
optional XXH64 content checksum (verified when present).

The compressor emits spec-legal RAW-block frames (magic, single-segment
frame header with content size, <=128 KiB raw blocks, optional XXH64
checksum). It performs no entropy coding — compression ratio 1.0 — but
every conforming decoder accepts its output; tests prove zstd-jni (on
Spark's classpath) round-trips it, and that this decoder reads real
entropy-coded frames produced by zstd-jni at many levels.

Scale note: pure-Python decode runs ~1 MB/s/core — the documented
slow-path exemption, Arrow-batched and embarrassingly parallel via
functions/compress.py, which prefers the C wheel when installed.
"""

from __future__ import annotations

_MAGIC = 0xFD2FB528
_SKIPPABLE_LO = 0x184D2A50
_BLOCK_MAX = 128 * 1024


class ZstdError(ValueError):
    pass


# --------------------------------------------------------------------------
# XXH64 (public domain algorithm; needed for the frame content checksum)

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            for _ in range(1):
                v1 = (_rotl((v1 + int.from_bytes(data[i:i+8], "little") * _P2) & _M64, 31) * _P1) & _M64
                v2 = (_rotl((v2 + int.from_bytes(data[i+8:i+16], "little") * _P2) & _M64, 31) * _P1) & _M64
                v3 = (_rotl((v3 + int.from_bytes(data[i+16:i+24], "little") * _P2) & _M64, 31) * _P1) & _M64
                v4 = (_rotl((v4 + int.from_bytes(data[i+24:i+32], "little") * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ (_rotl((v * _P2) & _M64, 31) * _P1) & _M64) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = (_rotl((int.from_bytes(data[i:i+8], "little") * _P2) & _M64, 31) * _P1) & _M64
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h = ((_rotl(h ^ ((int.from_bytes(data[i:i+4], "little") * _P1) & _M64), 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M64), 11) * _P1) & _M64
        i += 1
    h = ((h ^ (h >> 33)) * _P2) & _M64
    h = ((h ^ (h >> 29)) * _P3) & _M64
    return h ^ (h >> 32)


# --------------------------------------------------------------------------
# bit readers

class _BackBits:
    """zstd backward bitstream: a sentinel 1-bit tops the last byte; bits
    are then read MSB-down. `peek` zero-pads past the start (the Huffman
    tail convention); `read` is exact and raises on underrun."""

    __slots__ = ("val", "bits")

    def __init__(self, data: bytes):
        if not data or data[-1] == 0:
            raise ZstdError("corrupt backward bitstream (empty or zero padding)")
        self.val = int.from_bytes(data, "little")
        self.bits = (len(data) - 1) * 8 + data[-1].bit_length() - 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if n > self.bits:
            raise ZstdError("bitstream underrun")
        self.bits -= n
        return (self.val >> self.bits) & ((1 << n) - 1)

    def peek_pad(self, n: int) -> int:
        if n <= self.bits:
            return (self.val >> (self.bits - n)) & ((1 << n) - 1)
        if self.bits <= 0:
            return 0
        return (self.val & ((1 << self.bits) - 1)) << (n - self.bits)

    def consume_pad(self, n: int) -> None:
        self.bits -= n  # may go negative: zero padding consumed


class _FwdBits:
    """Forward little-endian bit reader (FSE table descriptions)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        end = self.pos + n
        if (end + 7) // 8 > len(self.data):
            raise ZstdError("FSE table description underrun")
        lo_byte = self.pos // 8
        hi_byte = (end + 7) // 8
        chunk = int.from_bytes(self.data[lo_byte:hi_byte], "little")
        out = (chunk >> (self.pos % 8)) & ((1 << n) - 1)
        self.pos = end
        return out

    def bytes_consumed(self) -> int:
        return (self.pos + 7) // 8


# --------------------------------------------------------------------------
# FSE

def _fse_read_distribution(data: bytes, max_symbol: int, max_al: int):
    """RFC 8878 §4.1.1 FSE table description -> (probs, accuracy_log,
    n_header_bytes). probs values: -1 (less-than-one) or >=0."""
    br = _FwdBits(data)
    al = br.read(4) + 5
    if al > max_al:
        raise ZstdError(f"FSE accuracy log {al} > max {max_al}")
    table_size = 1 << al
    remaining = table_size + 1
    threshold = table_size
    nbits = al + 1
    probs: list[int] = []
    prev0 = False
    while remaining > 1 and len(probs) <= max_symbol:
        if prev0:
            while True:
                rep = br.read(2)
                probs.extend([0] * rep)
                if rep < 3:
                    break
            prev0 = False
            if len(probs) > max_symbol:
                break
            continue
        maxv = (2 * threshold - 1) - remaining
        count = br.read(nbits - 1)
        if count < maxv:
            pass  # small value, nbits-1 bits were enough
        else:
            count |= br.read(1) << (nbits - 1)
            if count >= threshold:
                count -= maxv
        count -= 1
        remaining -= count if count >= 0 else -count
        probs.append(count)
        prev0 = count == 0
        while remaining < threshold:
            nbits -= 1
            threshold >>= 1
    if remaining != 1:
        raise ZstdError("corrupt FSE distribution (remaining != 1)")
    return probs, al, br.bytes_consumed()


def _fse_build_table(probs: list[int], al: int):
    """FSE decode table: lists (symbol, nbits, new_state_base) per cell."""
    size = 1 << al
    sym = [0] * size
    high = size - 1
    for s, p in enumerate(probs):
        if p == -1:
            sym[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    pos = 0
    for s, p in enumerate(probs):
        for _ in range(max(p, 0)):
            sym[pos] = s
            pos = (pos + step) & (size - 1)
            while pos > high:
                pos = (pos + step) & (size - 1)
    if pos != 0:
        raise ZstdError("corrupt FSE distribution (spread did not close)")
    nxt = [1 if p == -1 else p for p in probs]
    nb = [0] * size
    base = [0] * size
    for u in range(size):
        s = sym[u]
        x = nxt[s]
        nxt[s] += 1
        b = al - (x.bit_length() - 1)
        nb[u] = b
        base[u] = (x << b) - size
    return sym, nb, base, al


class _FseRle:
    """Degenerate 'table' for RLE sequence mode: one symbol, 0 bits."""

    def __init__(self, symbol: int):
        self.symbol = symbol


# --------------------------------------------------------------------------
# Huffman literals

def _huff_read_weights(data: bytes):
    """Huffman tree description -> (weights incl. implied last, n_bytes)."""
    if not data:
        raise ZstdError("empty huffman description")
    h = data[0]
    if h >= 128:  # direct: (h-127) weights, 4 bits each
        n = h - 127
        nbytes = 1 + (n + 1) // 2
        if nbytes > len(data):
            raise ZstdError("truncated direct huffman weights")
        weights = []
        for k in range(n):
            byte = data[1 + k // 2]
            weights.append((byte >> 4) if k % 2 == 0 else (byte & 0xF))
        consumed = nbytes
    else:  # FSE-compressed weights, h = compressed size
        if 1 + h > len(data):
            raise ZstdError("truncated FSE huffman weights")
        blob = data[1 : 1 + h]
        probs, al, hdr = _fse_read_distribution(blob, 255, 6)
        sym, nb, base, _ = _fse_build_table(probs, al)
        bs = _BackBits(blob[hdr:])
        s1 = bs.read(al)
        s2 = bs.read(al)
        weights = []
        while True:
            weights.append(sym[s1])
            if nb[s1] > bs.bits:
                weights.append(sym[s2])
                break
            s1 = base[s1] + bs.read(nb[s1])
            weights.append(sym[s2])
            if nb[s2] > bs.bits:
                weights.append(sym[s1])
                break
            s2 = base[s2] + bs.read(nb[s2])
            if len(weights) > 255:
                raise ZstdError("too many huffman weights")
        consumed = 1 + h
    if len(weights) > 255:
        raise ZstdError("too many huffman weights")
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ZstdError("huffman weights sum to zero")
    max_bits = total.bit_length()  # next power of two above total
    left = (1 << max_bits) - total
    if left & (left - 1):
        raise ZstdError("huffman weights not 2^n-complete")
    weights.append(left.bit_length())  # implied last symbol
    return weights, consumed


def _huff_build_table(weights: list[int]):
    """Canonical Huffman decode table: (table, max_bits); table entries
    (symbol, nbits) indexed by the top max_bits of the stream."""
    max_w = max(weights)
    max_bits = max_w  # num_bits = max_bits + 1 - w; weight max_w -> num_bits...
    # max_bits is determined by the weight total: recompute from weights
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    max_bits = (total - 1).bit_length() if total & (total - 1) == 0 else total.bit_length()
    # total is a power of two after the implied weight; max_bits = log2(total)
    if 1 << max_bits != total:
        raise ZstdError("huffman weight total not a power of two")
    table: list[tuple[int, int] | None] = [None] * (1 << max_bits)
    pos = 0
    for w in range(1, max_w + 1):
        for s, ws in enumerate(weights):
            if ws == w:
                span = 1 << (w - 1)
                nbits = max_bits + 1 - w
                entry = (s, nbits)
                table[pos : pos + span] = [entry] * span
                pos += span
    if pos != len(table):
        raise ZstdError("huffman table underfilled")
    return table, max_bits


def _huff_decode_stream(data: bytes, n_out: int, table, max_bits: int) -> bytearray:
    bs = _BackBits(data)
    out = bytearray()
    for _ in range(n_out):
        sym, nb = table[bs.peek_pad(max_bits)]
        bs.consume_pad(nb)
        out.append(sym)
    return out


# --------------------------------------------------------------------------
# sequence code tables (RFC 8878 §3.1.1.3.2.1)

_LL_BASE = list(range(16)) + [16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128,
                              256, 512, 1024, 2048, 4096, 8192, 16384, 32768, 65536]
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
_ML_BASE = list(range(3, 35)) + [35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131,
                                 259, 515, 1027, 2051, 4099, 8195, 16387, 32771, 65539]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]

_LL_DEFAULT = ([4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
                2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
                -1, -1, -1, -1], 6)
_ML_DEFAULT = ([1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                -1, -1, -1, -1, -1, -1, -1], 6)
_OF_DEFAULT = ([1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1], 5)

_MAX_SYMBOL = {"ll": 35, "ml": 52, "of": 31}
_MAX_AL = {"ll": 9, "ml": 9, "of": 8}
_DEFAULTS = {"ll": _LL_DEFAULT, "ml": _ML_DEFAULT, "of": _OF_DEFAULT}


def _seq_table(kind: str, mode: int, data: bytes, offset: int, prev):
    """Resolve one sequence-table compression mode -> (table, new_offset)."""
    if mode == 0:  # predefined
        probs, al = _DEFAULTS[kind]
        return _fse_build_table(probs, al), offset
    if mode == 1:  # RLE: one byte symbol
        return _FseRle(data[offset]), offset + 1
    if mode == 2:  # FSE description
        probs, al, n = _fse_read_distribution(
            data[offset:], _MAX_SYMBOL[kind], _MAX_AL[kind])
        return _fse_build_table(probs, al), offset + n
    if prev is None:
        raise ZstdError(f"repeat mode for {kind} with no previous table")
    return prev, offset


# --------------------------------------------------------------------------
# block decode

class _FrameState:
    __slots__ = ("huff", "ll", "ml", "of", "rep")

    def __init__(self):
        self.huff = None          # (table, max_bits)
        self.ll = self.ml = self.of = None
        self.rep = [1, 4, 8]      # repeat offsets, per frame


def _decode_literals(block: bytes, st: _FrameState):
    """-> (literals bytes, n_bytes_consumed_from_block)."""
    b0 = block[0]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype <= 1:  # raw / RLE
        if sf in (0, 2):
            regen = b0 >> 3
            hdr = 1
        elif sf == 1:
            regen = (b0 >> 4) | (block[1] << 4)
            hdr = 2
        else:
            regen = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            hdr = 3
        if ltype == 0:
            return bytes(block[hdr : hdr + regen]), hdr + regen
        return bytes([block[hdr]]) * regen, hdr + 1
    # compressed / treeless
    if sf in (0, 1):
        regen = (b0 >> 4) | ((block[1] & 0x3F) << 4)
        comp = (block[1] >> 6) | (block[2] << 2)
        hdr = 3
    elif sf == 2:
        regen = (b0 >> 4) | (block[1] << 4) | ((block[2] & 0x3) << 12)
        comp = (block[2] >> 2) | (block[3] << 6)
        hdr = 4
    else:
        regen = (b0 >> 4) | (block[1] << 4) | ((block[2] & 0x3F) << 12)
        comp = (block[2] >> 6) | (block[3] << 2) | (block[4] << 10)
        hdr = 5
    streams = 1 if sf == 0 else 4
    payload = block[hdr : hdr + comp]
    if len(payload) < comp:
        raise ZstdError("truncated literals payload")
    off = 0
    if ltype == 2:
        weights, n = _huff_read_weights(payload)
        st.huff = _huff_build_table(weights)
        off = n
    elif st.huff is None:
        raise ZstdError("treeless literals with no previous huffman table")
    table, max_bits = st.huff
    if streams == 1:
        lits = _huff_decode_stream(payload[off:], regen, table, max_bits)
    else:
        if comp - off < 6:
            raise ZstdError("truncated 4-stream jump table")
        s1 = int.from_bytes(payload[off : off + 2], "little")
        s2 = int.from_bytes(payload[off + 2 : off + 4], "little")
        s3 = int.from_bytes(payload[off + 4 : off + 6], "little")
        off += 6
        s4 = comp - off - s1 - s2 - s3
        if s4 <= 0:
            raise ZstdError("bad 4-stream sizes")
        r13 = (regen + 3) // 4
        r4 = regen - 3 * r13
        if r4 < 0:
            raise ZstdError("bad 4-stream regenerated size")
        lits = bytearray()
        for sz, rn in ((s1, r13), (s2, r13), (s3, r13), (s4, r4)):
            lits += _huff_decode_stream(payload[off : off + sz], rn, table, max_bits)
            off += sz
    if len(lits) != regen:
        raise ZstdError("literals regenerated size mismatch")
    return bytes(lits), hdr + comp


def _decode_block(block: bytes, out: bytearray, st: _FrameState,
                  frame_start: int = 0) -> None:
    lits, pos = _decode_literals(block, st)
    # sequence count
    if pos >= len(block):
        raise ZstdError("missing sequences section")
    b0 = block[pos]
    pos += 1
    if b0 == 0:
        out += lits
        return
    if b0 < 128:
        nseq = b0
    elif b0 < 255:
        nseq = ((b0 - 128) << 8) | block[pos]
        pos += 1
    else:
        nseq = int.from_bytes(block[pos : pos + 2], "little") + 0x7F00
        pos += 2
    modes = block[pos]
    pos += 1
    if modes & 3:
        raise ZstdError("reserved sequence mode bits set")
    st.ll, pos = _seq_table("ll", (modes >> 6) & 3, block, pos, st.ll)
    st.of, pos = _seq_table("of", (modes >> 4) & 3, block, pos, st.of)
    st.ml, pos = _seq_table("ml", (modes >> 2) & 3, block, pos, st.ml)

    bs = _BackBits(block[pos:])

    def init_state(t):
        return 0 if isinstance(t, _FseRle) else bs.read(t[3])

    ll_s = init_state(st.ll)
    of_s = init_state(st.of)
    ml_s = init_state(st.ml)

    def code(t, s):
        return t.symbol if isinstance(t, _FseRle) else t[0][s]

    def update(t, s):
        if isinstance(t, _FseRle):
            return s
        return t[2][s] + bs.read(t[1][s])

    lit_pos = 0
    rep = st.rep
    for i in range(nseq):
        of_code = code(st.of, of_s)
        ml_code = code(st.ml, ml_s)
        ll_code = code(st.ll, ll_s)
        if of_code > 31 or ml_code > 52 or ll_code > 35:
            raise ZstdError("sequence code out of range")
        # extra bits read order: offset, match length, literals length
        ofv = (1 << of_code) + (bs.read(of_code) if of_code else 0)
        ml = _ML_BASE[ml_code] + (bs.read(_ML_BITS[ml_code]) if _ML_BITS[ml_code] else 0)
        ll = _LL_BASE[ll_code] + (bs.read(_LL_BITS[ll_code]) if _LL_BITS[ll_code] else 0)
        # repeat-offset machine (RFC 8878 §3.1.1.5)
        if ofv > 3:
            offset = ofv - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            idx = ofv + (1 if ll == 0 else 0)
            if idx == 1:
                offset = rep[0]
            elif idx == 2:
                offset = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            elif idx == 3:
                offset = rep[2]
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            else:  # ll == 0 and ofv == 3: current offset_1 - 1
                offset = rep[0] - 1
                if offset == 0:
                    raise ZstdError("zero offset from rep1-1")
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
        out += lits[lit_pos : lit_pos + ll]
        lit_pos += ll
        if offset > len(out) - frame_start:
            # the window is per-FRAME: a corrupt later frame must not
            # silently copy bytes from a previous frame's output
            raise ZstdError("match offset beyond window")
        if offset >= ml:
            start = len(out) - offset
            out += out[start : start + ml]
        else:
            start = len(out) - offset
            for k in range(ml):
                out.append(out[start + k])
        if i < nseq - 1:  # state update order: LL, ML, OF
            ll_s = update(st.ll, ll_s)
            ml_s = update(st.ml, ml_s)
            of_s = update(st.of, of_s)
    out += lits[lit_pos:]


# --------------------------------------------------------------------------
# frame API

def decompress(data: bytes) -> bytes:
    data = bytes(data)
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        if i + 4 > n:
            raise ZstdError("truncated magic")
        magic = int.from_bytes(data[i : i + 4], "little")
        i += 4
        if (magic & 0xFFFFFFF0) == _SKIPPABLE_LO:
            sz = int.from_bytes(data[i : i + 4], "little")
            i += 4 + sz
            continue
        if magic != _MAGIC:
            raise ZstdError(f"bad magic {magic:#x}")
        fhd = data[i]
        i += 1
        fcs_flag = fhd >> 6
        single = (fhd >> 5) & 1
        checksum = (fhd >> 2) & 1
        did_flag = fhd & 3
        if fhd & 0x08:  # bit 3 reserved (bit 4 is Unused_bit — tolerated)
            raise ZstdError("reserved frame header bit set")
        if not single:
            i += 1  # window descriptor (we keep the whole frame in memory)
        did_len = (0, 1, 2, 4)[did_flag]
        if did_len:
            if int.from_bytes(data[i : i + did_len], "little") != 0:
                raise ZstdError("dictionaries not supported")
            i += did_len
        fcs_len = (0, 2, 4, 8)[fcs_flag]
        if fcs_flag == 0 and single:
            fcs_len = 1
        fcs = None
        if fcs_len:
            fcs = int.from_bytes(data[i : i + fcs_len], "little")
            if fcs_len == 2:
                fcs += 256
            i += fcs_len
        st = _FrameState()
        frame_start = len(out)
        while True:
            if i + 3 > n:
                raise ZstdError("truncated block header")
            h = int.from_bytes(data[i : i + 3], "little")
            i += 3
            last, btype, bsize = h & 1, (h >> 1) & 3, h >> 3
            if btype == 0:
                out += data[i : i + bsize]
                i += bsize
            elif btype == 1:
                out += data[i : i + 1] * bsize
                i += 1
            elif btype == 2:
                _decode_block(data[i : i + bsize], out, st, frame_start)
                i += bsize
            else:
                raise ZstdError("reserved block type")
            if last:
                break
        if fcs is not None and len(out) - frame_start != fcs:
            raise ZstdError(
                f"content size mismatch: header {fcs}, got {len(out) - frame_start}")
        if checksum:
            want = int.from_bytes(data[i : i + 4], "little")
            i += 4
            got = xxh64(bytes(out[frame_start:])) & 0xFFFFFFFF
            if got != want:
                raise ZstdError(f"xxh64 checksum mismatch {got:#x} != {want:#x}")
    return bytes(out)


def compress(data: bytes, checksum: bool = False) -> bytes:
    """Spec-legal raw-block frame (no entropy coding): single-segment
    header with exact content size, <=128 KiB raw blocks, optional
    verified XXH64. Any conforming decoder (zstd-jni proves it in tests)
    reads this; ratio is 1.0 by construction."""
    data = bytes(data)
    out = bytearray(_MAGIC.to_bytes(4, "little"))
    fhd = (3 << 6) | 0x20 | (0x04 if checksum else 0)  # 8-byte FCS, single-segment
    out.append(fhd)
    out += len(data).to_bytes(8, "little")
    n = len(data)
    if n == 0:
        out += (1).to_bytes(3, "little")  # last=1, raw, size 0
    else:
        pos = 0
        while pos < n:
            chunk = min(_BLOCK_MAX, n - pos)
            last = 1 if pos + chunk >= n else 0
            out += (last | (chunk << 3)).to_bytes(3, "little")
            out += data[pos : pos + chunk]
            pos += chunk
    if checksum:
        out += (xxh64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)
