"""FLAC codec — pure Python + numpy, written from scratch for the
multimodal audio pipeline.

Real speech corpora ship FLAC (LibriSpeech, MLS, People's Speech), and
this container has no soundfile/libflac, so the decode path here is
real: stream marker + STREAMINFO (+ skipped metadata blocks), frame
headers (UTF-8-coded frame numbers, CRC-8), subframes (CONSTANT /
VERBATIM / FIXED orders 0-4 / LPC with quantized coefficients), Rice
residual coding with partition orders and escape partitions, stereo
decorrelation (left-side / right-side / mid-side, with the side
channel's +1 bit), frame CRC-16, and the STREAMINFO MD5 of the decoded
PCM — all verified fail-closed (any mismatch raises ValueError; FLAC is
lossless, so a verified decode is bit-exact by construction).

The encoder produces genuinely compressed streams (fixed predictors
with per-partition Rice parameter search, optional mid-side stereo,
optional verbatim/constant subframes) — enough to exercise every
decoder path with exact round trips; LPC subframes are emitted with
order-2 quantized coefficients for bitstream-path coverage.

16-bit samples only (the corpus norm); other depths raise
NotImplementedError naming libflac.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _make_crc8_table() -> list[int]:
    tbl = []
    for b in range(256):
        crc = b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
        tbl.append(crc)
    return tbl


def _make_crc16_table() -> list[int]:
    tbl = []
    for b in range(256):
        crc = b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
            )
        tbl.append(crc)
    return tbl


_CRC8_TABLE = _make_crc8_table()
_CRC16_TABLE = _make_crc16_table()


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC16_TABLE[((crc >> 8) ^ b) & 0xFF] ^ ((crc << 8) & 0xFFFF)
    return crc


def _utf8_number(n: int) -> bytes:
    """FLAC frame-number coding (UTF-8 extended to 36 bits)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    # an nbytes coding carries (7 - nbytes) + 6*(nbytes-1) = 5*nbytes + 1
    # payload bits
    while n >= (1 << (5 * nbytes + 1)) and nbytes < 7:
        nbytes += 1
    lead_bits = 7 - nbytes
    shift = 6 * (nbytes - 1)
    lead = (0xFF << (lead_bits + 1)) & 0xFF | (n >> shift)
    out.append(lead)
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def write_many(self, vals: np.ndarray, lens: np.ndarray) -> None:
        """Bulk MSB-first append of (value, nbits) pairs via one numpy
        bit pack — the Rice residual loop emits one pair per sample and
        per-call Python bit writes dominate the encoder profile (same
        fix as the VP8L encoder's LSB write_many)."""
        vals = np.asarray(vals, dtype=np.int64)
        lens = np.asarray(lens, dtype=np.int64)
        total = int(lens.sum())
        if not total:
            return
        offs = np.cumsum(lens) - lens
        j = np.arange(total, dtype=np.int64) - np.repeat(offs, lens)
        shift = np.repeat(lens, lens) - 1 - j  # MSB first within each value
        # clamp: a unary run (value 1, q+1 bits) makes shift exceed 63,
        # and numpy >> with out-of-range counts is UNDEFINED (x86 masks
        # mod 64 -> a stray 1 bit inside the zero run on some builds);
        # values here are non-negative < 2^63, so min(shift, 63) is exact
        bits = ((np.repeat(vals, lens) >> np.minimum(shift, 63)) & 1).astype(np.uint8)
        if self.n:  # fold the pending sub-byte accumulator in front
            pend = (
                (self.acc >> (self.n - 1 - np.arange(self.n, dtype=np.int64))) & 1
            ).astype(np.uint8)
            bits = np.concatenate([pend, bits])
        packed = np.packbits(bits)  # MSB-first byte order
        nfull = bits.size // 8
        self.buf.extend(packed[:nfull].tobytes())
        rem = bits.size - nfull * 8
        self.acc = (int(packed[nfull]) >> (8 - rem)) if rem else 0
        self.n = rem

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0, cache=None) -> None:
        self.data = data
        self.pos = pos  # byte position of next fill
        self.acc = 0
        self.n = 0
        # optional (bits, ones) arrays shared across the file's frames —
        # unpacked once in decode_flac, they let Rice partitions decode
        # as numpy gathers instead of per-sample reader calls
        self.cache = cache

    def bitpos(self) -> int:
        """Absolute bit position of the next unread bit."""
        return self.pos * 8 - self.n

    def seek_bit(self, bp: int) -> None:
        """Reposition to absolute bit position ``bp`` (cache fast path's
        re-sync back into the byte-oriented reader state)."""
        self.pos = (bp + 7) >> 3
        self.n = self.pos * 8 - bp
        self.acc = (self.data[self.pos - 1] & ((1 << self.n) - 1)) if self.n else 0

    def read(self, nbits: int) -> int:
        while self.n < nbits:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= nbits
        v = (self.acc >> self.n) & ((1 << nbits) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.n == 0:
                if self.pos >= len(self.data):
                    raise ValueError("truncated FLAC unary run")
                self.acc = self.data[self.pos]
                self.pos += 1
                self.n = 8
            if self.acc == 0:
                q += self.n
                self.n = 0
                continue
            top = self.acc.bit_length()
            zeros = self.n - top
            q += zeros
            self.n = top - 1
            self.acc &= (1 << self.n) - 1
            return q

    def align(self) -> None:
        self.n = 0
        self.acc = 0

    def byte_pos(self) -> int:
        return self.pos


def _rice_fold(res: np.ndarray) -> np.ndarray:
    """signed residual -> non-negative zigzag (FLAC mapping)."""
    return np.where(res >= 0, res.astype(np.int64) * 2, -2 * res.astype(np.int64) - 1)


def _rice_unfold(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _best_rice_param(folded: np.ndarray) -> int:
    if len(folded) == 0:
        return 0
    mean = float(folded.mean())
    k = 0
    while (1 << (k + 1)) < mean + 1 and k < 14:
        k += 1
    return k


def _write_residual(bw: _BitWriter, res: np.ndarray, block: int, order: int) -> None:
    """Rice method 0 (4-bit params), single partition order chosen so
    partitions stay reasonable (0 here — simple, always legal)."""
    bw.write(0, 2)  # coding method: rice 4-bit
    bw.write(0, 4)  # partition order 0 -> one partition
    folded = _rice_fold(res)
    k = _best_rice_param(folded)
    if k >= 15 or (len(folded) and int(folded.max()).bit_length() > 30):
        # escape: raw signed residuals, nbits in a 5-bit field (<= 31).
        # Width comes from the SIGNED residual magnitudes, not the folded
        # domain (folding doubles the value range — sizing from it both
        # wasted a bit and could push nbits past the 5-bit field, which
        # previously truncated silently and produced a garbage stream)
        nbits = 1
        for r in res:
            r = int(r)
            need = (r.bit_length() + 1) if r >= 0 else ((-r - 1).bit_length() + 1)
            if need > nbits:
                nbits = need
        if nbits > 31:
            raise ValueError(
                f"FLAC escape partition needs {nbits}-bit residuals; the "
                "5-bit raw-width field caps at 31"
            )
        bw.write(0b1111, 4)
        bw.write(nbits, 5)
        bw.write_many(
            res.astype(np.int64) & ((1 << nbits) - 1),
            np.full(len(res), nbits, dtype=np.int64),
        )
        return
    bw.write(k, 4)
    q = (folded >> k).astype(np.int64)
    # one (1, q+1) pair emits the unary run (q zeros then the stop one),
    # one (low bits, k) pair the remainder — both in a single bulk pack.
    # Guard the expansion: a lone outlier under a small k means a huge
    # unary run (the per-bit expansion buffer is sum-of-bits sized), so
    # past ~2 MiB of bits fall back to the scalar writer
    total_bits = int(q.sum()) + len(folded) * (k + 1)
    if total_bits <= (1 << 24):
        vals = np.empty(2 * len(folded), dtype=np.int64)
        lens = np.empty(2 * len(folded), dtype=np.int64)
        vals[0::2] = 1
        lens[0::2] = q + 1
        vals[1::2] = folded.astype(np.int64) & ((1 << k) - 1)
        lens[1::2] = k
        bw.write_many(vals, lens)
        return
    for u in folded:
        u = int(u)
        bw.write_unary(u >> k)
        bw.write(u & ((1 << k) - 1), k)


def _rice_decode_vec(br: _BitReader, n: int, k: int) -> np.ndarray | None:
    """Whole-partition Rice decode as numpy gathers: locate the n unary
    stop bits by pointer-jumping over the file's 1-bit positions
    (``nxt[j] = first one >= ones[j] + 1 + k`` applied i times via a
    binary-decomposition walk), then batch-extract the k-bit remainders.
    Returns None when the cache can't serve it (truncation near EOF) —
    caller falls back to the exact scalar path and its error messages."""
    bits, ones = br.cache
    total = bits.size
    P = br.bitpos()
    j0 = int(np.searchsorted(ones, P))
    # working slice: each sample consumes exactly one stop-one and at
    # most k payload-ones, so n*(k+1) ones bound the partition
    hi = min(j0 + n * (k + 1) + 1, ones.size)
    seg = ones[j0:hi]
    m = seg.size
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if m == 0:
        return None  # no stop bits left -> truncated; scalar path raises
    if k == 0:
        # no payload bits: every one in the region IS a stop bit
        if n > m:
            return None
        stops = seg[:n]
    else:
        # relative jump function: nxt[j] = first one >= seg[j] + 1 + k
        # (skip the stop bit itself plus k payload bits); index m is the
        # absorbing out-of-range state. j_i = nxt^i(0) for all i at once
        # via binary decomposition with a squared jump table.
        nxt = np.searchsorted(seg, seg + 1 + k).astype(np.int64)
        T = np.append(nxt, m)  # T[m] = m
        idx = np.zeros(n, dtype=np.int64)
        steps = np.arange(n, dtype=np.int64)
        level = 0
        while (1 << level) <= n - 1:
            mask = ((steps >> level) & 1).astype(bool)
            if mask.any():
                idx[mask] = T[idx[mask]]
            T = T[T]  # nxt^(2^level) -> nxt^(2^(level+1))
            level += 1
        if (idx >= m).any():
            return None  # ran past the slice -> truncated stream
        stops = seg[idx]
    prev = np.empty(n, dtype=np.int64)
    prev[0] = P
    prev[1:] = stops[:-1] + 1 + k
    q = stops - prev
    if (q < 0).any():
        return None
    end = int(stops[-1]) + 1 + k
    if end > total:
        return None
    if k:
        low = bits[stops[:, None] + 1 + np.arange(k, dtype=np.int64)].astype(
            np.int64
        ) @ (1 << np.arange(k - 1, -1, -1, dtype=np.int64))
        u = (q << k) | low
    else:
        u = q
    br.seek_bit(end)
    return np.where(u & 1 == 0, u >> 1, -((u + 1) >> 1))


def _read_residual(br: _BitReader, block: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual coding method {method}")
    plen = 4 if method == 0 else 5
    po = br.read(4)
    nparts = 1 << po
    if block % nparts:
        raise ValueError("FLAC partition order does not divide block size")
    out = np.empty(block - order, dtype=np.int64)
    idx = 0
    for p in range(nparts):
        n = (block >> po) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC partition shorter than predictor order")
        k = br.read(plen)
        if k == (1 << plen) - 1:  # escape: raw
            nbits = br.read(5)
            if br.cache is not None and nbits:
                bits, _ones = br.cache
                P = br.bitpos()
                if P + n * nbits <= bits.size:
                    offs = P + np.arange(n, dtype=np.int64) * nbits
                    mat = bits[offs[:, None] + np.arange(nbits, dtype=np.int64)]
                    v = mat.astype(np.int64) @ (
                        1 << np.arange(nbits - 1, -1, -1, dtype=np.int64)
                    )
                    out[idx : idx + n] = v - (v >= (1 << (nbits - 1))) * (1 << nbits)
                    idx += n
                    br.seek_bit(P + n * nbits)
                    continue
            for _ in range(n):
                out[idx] = br.read_signed(nbits) if nbits else 0
                idx += 1
        else:
            dec = _rice_decode_vec(br, n, k) if br.cache is not None else None
            if dec is not None:
                out[idx : idx + n] = dec
                idx += n
                continue
            for _ in range(n):
                q = br.read_unary()
                u = (q << k) | (br.read(k) if k else 0)
                out[idx] = _rice_unfold(u)
                idx += 1
    return out


def _predict_fixed(order: int, warm: np.ndarray, res: np.ndarray) -> np.ndarray:
    """Invert the fixed predictor: the order-d residual is the d-th
    finite difference of the signal (binomial coefficients), so
    reconstruction is d iterated cumulative sums seeded by the warmup's
    difference pyramid — no per-sample IIR loop."""
    if order == 0:
        out = np.empty(len(warm) + len(res), dtype=np.int64)
        out[: len(warm)] = warm
        out[len(warm):] = res
        return out
    wd = warm.astype(np.int64)
    heads = [wd[:1]]
    for _ in range(1, order):
        wd = np.diff(wd)
        heads.append(wd[:1])  # heads[j] = (delta^j x)[j]
    cur = res.astype(np.int64)  # delta^order x at indices order..N-1
    for j in range(order - 1, -1, -1):
        cur = np.cumsum(np.concatenate([heads[j], cur]))
    return cur


def _subframe_residual(order: int, samples: np.ndarray) -> np.ndarray:
    coeffs = FIXED_COEFFS[order]
    res = samples[order:].astype(np.int64)
    for j, c in enumerate(coeffs):
        res = res - c * samples[order - 1 - j : len(samples) - 1 - j].astype(np.int64)
    return res


def _write_subframe(
    bw: _BitWriter, samples: np.ndarray, bits: int, mode: str
) -> None:
    if mode == "lpc2" and len(samples) <= 2:
        # a block shorter than the LPC order cannot carry the promised
        # warmup samples — downgrade to verbatim
        mode = "verbatim"
    bw.write(0, 1)  # pad
    if mode == "constant":
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write(int(samples[0]) & ((1 << bits) - 1), bits)
        return
    if mode == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        bw.write_many(
            samples.astype(np.int64) & ((1 << bits) - 1),
            np.full(len(samples), bits, dtype=np.int64),
        )
        return
    if mode == "lpc2":
        # LPC order 2 with coefficients equal to the fixed order-2
        # predictor (precision 4 bits, shift 0) — a genuine LPC
        # subframe whose reconstruction is exactly known. A final block
        # shorter than the order cannot carry it (the header would
        # promise more warmup samples than exist) — verbatim instead.
        order = 2
        bw.write(0b100000 | (order - 1), 6)
        bw.write(0, 1)
        for s in samples[:order]:
            bw.write(int(s) & ((1 << bits) - 1), bits)
        bw.write(4 - 1, 4)  # coefficient precision - 1
        bw.write(0, 5)      # shift (signed 5 bits)
        for c in (2, -1):
            bw.write(c & 0xF, 4)
        res = _subframe_residual(order, samples)
        _write_residual(bw, res, len(samples), order)
        return
    # fixed: pick the order with the smallest folded-residual sum
    best_order, best_cost, best_res = 0, None, None
    for order in range(5):
        if order > len(samples) - 1:
            break
        res = _subframe_residual(order, samples)
        cost = int(_rice_fold(res).sum())
        if best_cost is None or cost < best_cost:
            best_order, best_cost, best_res = order, cost, res
    bw.write(0b001000 | best_order, 6)
    bw.write(0, 1)
    for s in samples[:best_order]:
        bw.write(int(s) & ((1 << bits) - 1), bits)
    _write_residual(bw, best_res, len(samples), best_order)


def _read_subframe(br: _BitReader, block: int, bits: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("FLAC subframe padding bit set")
    ftype = br.read(6)
    if br.read(1):  # wasted bits flag
        wasted = 1 + br.read_unary()
    else:
        wasted = 0
    eff = bits - wasted
    if ftype == 0:  # CONSTANT
        v = br.read_signed(eff)
        out = np.full(block, v, dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        out = np.array([br.read_signed(eff) for _ in range(block)], dtype=np.int64)
    elif 8 <= ftype <= 12:  # FIXED
        order = ftype - 8
        warm = np.array([br.read_signed(eff) for _ in range(order)], dtype=np.int64)
        res = _read_residual(br, block, order)
        out = _predict_fixed(order, warm, res)
    elif ftype >= 32:  # LPC
        order = (ftype & 0x1F) + 1
        warm = np.array([br.read_signed(eff) for _ in range(order)], dtype=np.int64)
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision code")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coeffs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, block, order)
        out = np.empty(block, dtype=np.int64)
        out[:order] = warm
        for i in range(order, block):
            pred = sum(c * int(out[i - 1 - j]) for j, c in enumerate(coeffs))
            out[i] = int(res[i - order]) + (pred >> shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    return out << wasted


def encode_flac(
    rate: int,
    pcm: np.ndarray,
    block_size: int = 4096,
    stereo_mode: str = "lr",
    subframe_mode: str = "fixed",
) -> bytes:
    """16-bit PCM -> FLAC stream. ``pcm`` is (n,) mono or (n, 2) stereo
    int16. ``stereo_mode``: 'lr' (independent), 'ms' (mid-side), 'ls'
    (left-side), 'rs' (right-side). ``subframe_mode``: 'fixed'
    (order-searched fixed predictors — real compression), 'verbatim',
    'constant' (requires constant input), or 'lpc2'."""
    pcm = np.asarray(pcm, dtype=np.int16)
    if pcm.ndim == 2 and pcm.shape[1] == 1:
        pcm = pcm[:, 0]  # (n,1) is mono
    if pcm.ndim == 2 and pcm.shape[1] != 2:
        raise ValueError(f"PCM must be (n,) mono or (n,2) stereo, got {pcm.shape}")
    stereo = pcm.ndim == 2
    nch = 2 if stereo else 1
    n = pcm.shape[0]
    if n == 0:
        raise ValueError("empty PCM")

    md5 = hashlib.md5(pcm.astype("<i2").tobytes()).digest()
    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block): type 0, length 34
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    packed = (rate << 44) | ((nch - 1) << 41) | ((16 - 1) << 36) | n
    si += packed.to_bytes(8, "big")
    si += md5
    out += bytes([0x80]) + struct.pack(">I", 34)[1:] + si

    frame_no = 0
    for start in range(0, n, block_size):
        blk = pcm[start : start + block_size]
        bs = blk.shape[0]
        if stereo:
            left = blk[:, 0].astype(np.int64)
            right = blk[:, 1].astype(np.int64)
            if stereo_mode == "lr":
                chan_assign, chans, cbits = 1, [left, right], [16, 16]
            elif stereo_mode == "ls":
                chan_assign, chans, cbits = 8, [left, left - right], [16, 17]
            elif stereo_mode == "rs":
                chan_assign, chans, cbits = 9, [left - right, right], [17, 16]
            elif stereo_mode == "ms":
                chan_assign = 10
                chans = [(left + right) >> 1, left - right]
                cbits = [16, 17]
            else:
                raise ValueError(f"unknown stereo_mode {stereo_mode!r}")
        else:
            chan_assign, chans, cbits = 0, [blk.astype(np.int64)], [16]

        hdr = bytearray()
        hdr += bytes([0xFF, 0xF8])  # sync + fixed blocksize strategy
        hdr += bytes([(0b0111 << 4) | 0b0000])  # bs: 16-bit follows; rate: STREAMINFO
        hdr += bytes([(chan_assign << 4) | (0b100 << 1)])  # 16-bit, reserved 0
        hdr += _utf8_number(frame_no)
        hdr += struct.pack(">H", bs - 1)
        hdr.append(_crc8(bytes(hdr)))

        bw = _BitWriter()
        for ch, bits in zip(chans, cbits):
            mode = subframe_mode
            if mode == "fixed" and np.all(ch == ch[0]):
                mode = "constant"
            _write_subframe(bw, ch, bits, mode)
        bw.align()
        frame = bytes(hdr) + bw.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
        frame_no += 1
    return bytes(out)


def decode_flac(blob: bytes) -> tuple[int, np.ndarray]:
    """FLAC stream -> (rate, int16 array: (n,) mono or (n, ch) multi).
    CRC-8 (frame headers), CRC-16 (frames) and the STREAMINFO MD5 are
    all verified — any mismatch is a loud ValueError."""
    try:
        return _decode_flac_inner(blob)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed FLAC: {exc}") from exc


def _decode_flac_inner(blob: bytes) -> tuple[int, np.ndarray]:
    if blob[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC marker)")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(blob):
            raise ValueError("truncated FLAC metadata")
        hdr = blob[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + blob[pos + 1 : pos + 4])
        body = blob[pos + 4 : pos + 4 + blen]
        if len(body) < blen:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:
            if blen != 34:
                raise ValueError(f"FLAC STREAMINFO length {blen} != 34")
            streaminfo = body
        elif btype == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC stream missing STREAMINFO")
    packed = int.from_bytes(streaminfo[10:18], "big")
    rate = packed >> 44
    nch = ((packed >> 41) & 0x7) + 1
    bits = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    want_md5 = streaminfo[18:34]
    if bits != 16:
        raise NotImplementedError(
            f"{bits}-bit FLAC requires libflac; only 16-bit decodes here"
        )
    if rate == 0 or nch > 2:
        raise NotImplementedError(
            f"FLAC with {nch} channels / rate {rate} requires libflac"
        )

    chans_out: list[np.ndarray] = []
    got = 0
    # One bit/one-position unpack for the whole file, shared by every
    # frame's reader — the Rice fast path decodes partitions as gathers.
    # Capped: the cache is an ~8-12x transient expansion (uint8 bit array
    # + int32 one-positions), fine for corpus blobs but an executor-
    # memory hazard for multi-MB files under concurrent Arrow workers —
    # past the cap the exact scalar reader serves, as before round 7.
    if len(blob) <= (2 << 20):
        _bits_all = np.unpackbits(np.frombuffer(blob, dtype=np.uint8))
        bitcache = (_bits_all, np.flatnonzero(_bits_all).astype(np.int32))
    else:
        bitcache = None
    # total == 0 means "unknown length" (spec-legal for streamed FLAC):
    # decode frames until the data runs out instead of decoding nothing
    while (got < total) if total else (pos + 5 <= len(blob)):
        if pos + 5 > len(blob):
            raise ValueError("truncated FLAC frame stream")
        hstart = pos
        if blob[pos] != 0xFF or (blob[pos + 1] & 0xFC) != 0xF8:
            raise ValueError(f"bad FLAC frame sync at {pos}")
        variable_bs = bool(blob[pos + 1] & 0x01)
        bs_code = blob[pos + 2] >> 4
        sr_code = blob[pos + 2] & 0x0F
        chan_assign = blob[pos + 3] >> 4
        size_code = (blob[pos + 3] >> 1) & 0x7
        pos += 4
        # UTF-8 frame/sample number
        lead = blob[pos]
        if lead < 0x80:
            pos += 1
        else:
            extra = 0
            while lead & (0x80 >> (extra + 1)) and extra < 6:
                extra += 1
            pos += 1 + extra
        if bs_code == 0b0110:
            bs = blob[pos] + 1
            pos += 1
        elif bs_code == 0b0111:
            bs = struct.unpack(">H", blob[pos : pos + 2])[0] + 1
            pos += 2
        elif bs_code in (0, 0b1111):
            raise ValueError(f"reserved FLAC block size code {bs_code}")
        elif bs_code == 1:
            bs = 192
        elif 2 <= bs_code <= 5:
            bs = 576 << (bs_code - 2)
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 0b1100:
            pos += 1
        elif sr_code in (0b1101, 0b1110):
            pos += 2
        elif sr_code == 0b1111:
            raise ValueError("invalid FLAC sample rate code")
        if _crc8(blob[hstart:pos]) != blob[pos]:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        pos += 1

        if size_code not in (0, 0b100):
            raise NotImplementedError(
                "per-frame FLAC sample-size override requires libflac"
            )
        if variable_bs:
            raise NotImplementedError(
                "variable-blocksize FLAC requires libflac"
            )

        br = _BitReader(blob, pos, cache=bitcache)
        if chan_assign < 8:
            if chan_assign + 1 != nch:
                raise ValueError("FLAC frame channel count != STREAMINFO")
            subs = [_read_subframe(br, bs, 16) for _ in range(nch)]
        elif chan_assign == 8:  # left-side
            left = _read_subframe(br, bs, 16)
            side = _read_subframe(br, bs, 17)
            subs = [left, left - side]
        elif chan_assign == 9:  # right-side
            side = _read_subframe(br, bs, 17)
            right = _read_subframe(br, bs, 16)
            subs = [side + right, right]
        elif chan_assign == 10:  # mid-side
            mid = _read_subframe(br, bs, 16)
            side = _read_subframe(br, bs, 17)
            # mid = (l+r)>>1 dropped the sum's low bit; side = l-r has
            # that bit as its parity, so (mid<<1)|(side&1) recovers l+r
            m2 = (mid << 1) | (side & 1)
            l = (m2 + side) >> 1
            r = (m2 - side) >> 1
            subs = [l, r]
        else:
            raise ValueError(f"reserved FLAC channel assignment {chan_assign}")
        br.align()
        pos = br.byte_pos()
        if pos + 2 > len(blob):
            raise ValueError("truncated FLAC frame CRC")
        if _crc16(blob[hstart:pos]) != struct.unpack(">H", blob[pos : pos + 2])[0]:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos += 2
        chans_out.append(np.stack(subs, axis=1) if nch > 1 else subs[0][:, None])
        got += bs

    if not chans_out:
        raise ValueError("FLAC stream contains no frames")
    full = np.concatenate(chans_out, axis=0)
    if total:
        full = full[:total]
    if np.any(full > 32767) or np.any(full < -32768):
        raise ValueError("FLAC decoded samples out of 16-bit range")
    pcm = full.astype("<i2")
    if want_md5 != b"\x00" * 16:
        if hashlib.md5(pcm.tobytes()).digest() != want_md5:
            raise ValueError("FLAC STREAMINFO MD5 mismatch (corrupt stream)")
    return rate, pcm[:, 0] if pcm.shape[1] == 1 else pcm
