"""MPEG-1 Layer III frame crafting (encoder-side bit packing, no psychoacoustics).

Building block for two things:
  * tools/probe_mp3_tables.py — machine-extracts the Layer III Huffman code
    books and the synthesis window from the system's libmpg123 by feeding it
    crafted frames and reading PCM back (data provenance for the from-scratch
    decoder in native/mp3_decode.cc, same pattern as tools/extract_lexicon.py).
  * tests/test_mp3_native.py — targeted conformance vectors that exercise a
    chosen Huffman table / block type / stereo mode on demand.

Only what probing needs is supported: MPEG-1, mono, long blocks,
main_data_begin=0 (no bit reservoir), scalefac_compress=0 (zero scalefactor
bits). The payload is raw main-data bits supplied by the caller.
"""
from __future__ import annotations

from dataclasses import dataclass, field

BITRATES_V1L3 = {32: 1, 40: 2, 48: 3, 56: 4, 64: 5, 80: 6, 96: 7, 112: 8,
                 128: 9, 160: 10, 192: 11, 224: 12, 256: 13, 320: 14}
RATES_V1 = {44100: 0, 48000: 1, 32000: 2}


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> "BitWriter":
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)
        return self

    def write_bits(self, bitstring: str) -> "BitWriter":
        self.bits.extend(1 if c == "1" else 0 for c in bitstring)
        return self

    def to_bytes(self, pad_to: int | None = None) -> bytes:
        bits = list(self.bits)
        if pad_to is not None:
            assert len(bits) <= pad_to * 8, "payload exceeds frame"
            bits += [0] * (pad_to * 8 - len(bits))
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        return bytes(out)


@dataclass
class GranuleSpec:
    """One granule's side info + main-data bits (mono, long blocks)."""
    data_bits: str = ""            # scalefac (none) + huffman region bits
    big_values: int = 0            # number of (x, y) PAIRS
    global_gain: int = 210
    table_select: tuple = (1, 1, 1)
    region0_count: int = 0
    region1_count: int = 0
    count1table_select: int = 0
    part2_3_length: int | None = None   # default: len(data_bits)
    # short/mixed blocks (window_switching) for block-type probes
    window_switching: bool = False
    block_type: int = 0
    mixed_block: bool = False
    subblock_gain: tuple = (0, 0, 0)
    # stereo-probe fields (frame_stereo only; frame_mono keeps sfc=0)
    scalefac_compress: int = 0
    preflag: int = 0
    scalefac_scale: int = 0


def frame_mono(granules: list[GranuleSpec], rate: int = 48000,
               bitrate: int = 192) -> bytes:
    """Two GranuleSpecs -> one self-contained MPEG-1 mono Layer III frame."""
    assert len(granules) == 2
    nbytes = 144 * bitrate * 1000 // rate
    hdr = BitWriter()
    hdr.write(0x7FF, 11)            # sync
    hdr.write(0b11, 2)              # MPEG-1
    hdr.write(0b01, 2)              # Layer III
    hdr.write(1, 1)                 # no CRC
    hdr.write(BITRATES_V1L3[bitrate], 4)
    hdr.write(RATES_V1[rate], 2)
    hdr.write(0, 1)                 # padding
    hdr.write(0, 1)                 # private
    hdr.write(0b11, 2)              # mono
    hdr.write(0, 2)                 # mode ext
    hdr.write(0, 1).write(0, 1)     # copyright / original
    hdr.write(0, 2)                 # emphasis

    side = BitWriter()
    side.write(0, 9)                # main_data_begin = 0 (no reservoir)
    side.write(0, 5)                # private (mono)
    side.write(0, 4)                # scfsi
    for g in granules:
        p23 = g.part2_3_length if g.part2_3_length is not None \
            else len(g.data_bits)
        assert p23 < 4096 and g.big_values < 512
        side.write(p23, 12)
        side.write(g.big_values, 9)
        side.write(g.global_gain, 8)
        side.write(0, 4)            # scalefac_compress = 0 (no sf bits)
        if g.window_switching:
            side.write(1, 1)
            side.write(g.block_type, 2)
            side.write(1 if g.mixed_block else 0, 1)
            for t in g.table_select[:2]:
                side.write(t, 5)
            for sg in g.subblock_gain:
                side.write(sg, 3)
        else:
            side.write(0, 1)
            for t in g.table_select:
                side.write(t, 5)
            side.write(g.region0_count, 4)
            side.write(g.region1_count, 3)
        side.write(0, 1)            # preflag
        side.write(0, 1)            # scalefac_scale
        side.write(g.count1table_select, 1)

    main = BitWriter()
    for g in granules:
        main.write_bits(g.data_bits)
        p23 = g.part2_3_length if g.part2_3_length is not None \
            else len(g.data_bits)
        assert p23 >= len(g.data_bits)
        main.write(0, p23 - len(g.data_bits))

    body = side.to_bytes() + main.to_bytes()
    payload = body + b"\x00" * (nbytes - 4 - len(body))
    assert len(body) <= nbytes - 4, "main data exceeds frame"
    return hdr.to_bytes() + payload


SILENT = GranuleSpec()


def probe_stream(probes: list[GranuleSpec], rate: int = 48000,
                 bitrate: int = 192) -> bytes:
    """Each probe goes in granule 0 of its own frame, followed by a fully
    silent frame so IMDCT overlap + synthesis-FIFO bleed stays attributable;
    a leading silent frame gives the decoder a clean sync/warmup."""
    frames = [frame_mono([SILENT, SILENT], rate, bitrate)]
    for g in probes:
        frames.append(frame_mono([g, SILENT], rate, bitrate))
        frames.append(frame_mono([SILENT, SILENT], rate, bitrate))
    return b"".join(frames)


def frame_stereo(granules: list[tuple], rate: int = 48000,
                 bitrate: int = 192, mode: int = 1,
                 mode_ext: int = 0) -> bytes:
    """granules = [(gr0_ch0, gr0_ch1), (gr1_ch0, gr1_ch1)] -> one MPEG-1
    joint/plain-stereo frame. Used for the intensity/MS conformance probes
    (tests/test_mp3_native.py) that lame never emits."""
    assert len(granules) == 2
    nbytes = 144 * bitrate * 1000 // rate
    hdr = BitWriter()
    hdr.write(0x7FF, 11)
    hdr.write(0b11, 2)
    hdr.write(0b01, 2)
    hdr.write(1, 1)
    hdr.write(BITRATES_V1L3[bitrate], 4)
    hdr.write(RATES_V1[rate], 2)
    hdr.write(0, 1).write(0, 1)
    hdr.write(mode, 2)
    hdr.write(mode_ext, 2)
    hdr.write(0, 1).write(0, 1).write(0, 2)

    side = BitWriter()
    side.write(0, 9)                # main_data_begin
    side.write(0, 3)                # private (stereo)
    side.write(0, 8)                # scfsi both channels
    for pair in granules:
        for g in pair:
            p23 = g.part2_3_length if g.part2_3_length is not None \
                else len(g.data_bits)
            side.write(p23, 12)
            side.write(g.big_values, 9)
            side.write(g.global_gain, 8)
            side.write(getattr(g, "scalefac_compress", 0), 4)
            if g.window_switching:
                side.write(1, 1)
                side.write(g.block_type, 2)
                side.write(1 if g.mixed_block else 0, 1)
                for t in g.table_select[:2]:
                    side.write(t, 5)
                for sg in g.subblock_gain:
                    side.write(sg, 3)
            else:
                side.write(0, 1)
                for t in g.table_select:
                    side.write(t, 5)
                side.write(g.region0_count, 4)
                side.write(g.region1_count, 3)
            side.write(getattr(g, "preflag", 0), 1)
            side.write(g.scalefac_scale if hasattr(g, "scalefac_scale")
                       else 0, 1)
            side.write(g.count1table_select, 1)

    main = BitWriter()
    for pair in granules:
        for g in pair:
            main.write_bits(g.data_bits)
            p23 = g.part2_3_length if g.part2_3_length is not None \
                else len(g.data_bits)
            main.write(0, p23 - len(g.data_bits))

    body = side.to_bytes() + main.to_bytes()
    assert len(body) <= nbytes - 4, "main data exceeds frame"
    payload = body + b"\x00" * (nbytes - 4 - len(body))
    return hdr.to_bytes() + payload


# ------------------------------------------------------------ LSF frames
BITRATES_V2L3 = {8: 1, 16: 2, 24: 3, 32: 4, 40: 5, 48: 6, 56: 7, 64: 8,
                 80: 9, 96: 10, 112: 11, 128: 12, 144: 13, 160: 14}
RATES_V2 = {22050: 0, 24000: 1, 16000: 2}
RATES_V25 = {11025: 0, 12000: 1, 8000: 2}


def frame_mono_lsf(granule: GranuleSpec, rate: int = 22050,
                   bitrate: int = 64) -> bytes:
    """One MPEG-2/2.5 (LSF) mono Layer III frame: 1 granule, 8-bit
    main_data_begin, 9-bit scalefac_compress (kept 0 = no scalefactor
    bits), no preflag field. Exists to craft LSF mixed-block conformance
    vectors — no encoder in the image emits mixed blocks at all."""
    v25 = rate in RATES_V25
    nbytes = 72 * bitrate * 1000 // rate
    hdr = BitWriter()
    hdr.write(0x7FF, 11)                 # sync
    hdr.write(0b00 if v25 else 0b10, 2)  # MPEG-2.5 / MPEG-2
    hdr.write(0b01, 2)                   # Layer III
    hdr.write(1, 1)                      # no CRC
    hdr.write(BITRATES_V2L3[bitrate], 4)
    hdr.write((RATES_V25 if v25 else RATES_V2)[rate], 2)
    hdr.write(0, 1).write(0, 1)          # padding / private
    hdr.write(0b11, 2)                   # mono
    hdr.write(0, 2)                      # mode ext
    hdr.write(0, 1).write(0, 1).write(0, 2)

    side = BitWriter()
    side.write(0, 8)                     # main_data_begin
    side.write(0, 1)                     # private (mono)
    g = granule
    p23 = g.part2_3_length if g.part2_3_length is not None \
        else len(g.data_bits)
    assert p23 < 4096 and g.big_values < 512
    side.write(p23, 12)
    side.write(g.big_values, 9)
    side.write(g.global_gain, 8)
    side.write(g.scalefac_compress, 9)
    if g.window_switching:
        side.write(1, 1)
        side.write(g.block_type, 2)
        side.write(1 if g.mixed_block else 0, 1)
        for t in g.table_select[:2]:
            side.write(t, 5)
        for sg in g.subblock_gain:
            side.write(sg, 3)
    else:
        side.write(0, 1)
        for t in g.table_select:
            side.write(t, 5)
        side.write(g.region0_count, 4)
        side.write(g.region1_count, 3)
    side.write(g.scalefac_scale, 1)      # no preflag at LSF
    side.write(g.count1table_select, 1)

    main = BitWriter()
    main.write_bits(g.data_bits)
    main.write(0, p23 - len(g.data_bits))
    body = side.to_bytes() + main.to_bytes()
    assert len(body) <= nbytes - 4, "main data exceeds frame"
    return hdr.to_bytes() + body + b"\x00" * (nbytes - 4 - len(body))


def probe_stream_lsf(probes: list[GranuleSpec], rate: int = 22050,
                     bitrate: int = 64) -> bytes:
    frames = [frame_mono_lsf(SILENT, rate, bitrate)]
    for g in probes:
        frames.append(frame_mono_lsf(g, rate, bitrate))
        frames.append(frame_mono_lsf(SILENT, rate, bitrate))
    return b"".join(frames)


def frame_stereo_lsf(pair: tuple, rate: int = 22050, bitrate: int = 64,
                     mode: int = 1, mode_ext: int = 0) -> bytes:
    """(gr_ch0, gr_ch1) -> one MPEG-2/2.5 joint/plain-stereo frame (LSF:
    one granule). Exists to craft LSF intensity-stereo conformance
    vectors — no encoder in the image emits LSF intensity, and the
    panning law differs from MPEG-1 (13818-3 io^((is_pos+1)/2) vs
    11172-3 tan(is_pos*pi/12))."""
    v25 = rate in RATES_V25
    nbytes = 72 * bitrate * 1000 // rate
    hdr = BitWriter()
    hdr.write(0x7FF, 11)
    hdr.write(0b00 if v25 else 0b10, 2)  # MPEG-2.5 / MPEG-2
    hdr.write(0b01, 2)                   # Layer III
    hdr.write(1, 1)                      # no CRC
    hdr.write(BITRATES_V2L3[bitrate], 4)
    hdr.write((RATES_V25 if v25 else RATES_V2)[rate], 2)
    hdr.write(0, 1).write(0, 1)          # padding / private
    hdr.write(mode, 2)
    hdr.write(mode_ext, 2)
    hdr.write(0, 1).write(0, 1).write(0, 2)

    side = BitWriter()
    side.write(0, 8)                     # main_data_begin
    side.write(0, 2)                     # private (stereo)
    for g in pair:
        p23 = g.part2_3_length if g.part2_3_length is not None \
            else len(g.data_bits)
        assert p23 < 4096 and g.big_values < 512
        side.write(p23, 12)
        side.write(g.big_values, 9)
        side.write(g.global_gain, 8)
        side.write(g.scalefac_compress, 9)
        if g.window_switching:
            side.write(1, 1)
            side.write(g.block_type, 2)
            side.write(1 if g.mixed_block else 0, 1)
            for t in g.table_select[:2]:
                side.write(t, 5)
            for sg in g.subblock_gain:
                side.write(sg, 3)
        else:
            side.write(0, 1)
            for t in g.table_select:
                side.write(t, 5)
            side.write(g.region0_count, 4)
            side.write(g.region1_count, 3)
        side.write(g.scalefac_scale, 1)  # no preflag at LSF
        side.write(g.count1table_select, 1)

    main = BitWriter()
    for g in pair:
        p23 = g.part2_3_length if g.part2_3_length is not None \
            else len(g.data_bits)
        main.write_bits(g.data_bits)
        main.write(0, p23 - len(g.data_bits))
    body = side.to_bytes() + main.to_bytes()
    assert len(body) <= nbytes - 4, "main data exceeds frame"
    return hdr.to_bytes() + body + b"\x00" * (nbytes - 4 - len(body))
