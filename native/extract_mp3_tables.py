#!/usr/bin/env python3
"""Extract the ISO 11172-3 Layer III constants into native/mp3_tables.h.

An MPEG-1 Layer III decoder needs two families of standard-mandated
constants: the 17 distinct Huffman code tables (15 spectrum-pair tables +
2 count1 quad tables) and the 512-tap synthesis-filterbank window D.
They are fixed by the MPEG-1 audio spec — every encoder and decoder
embeds the same numbers — and this environment has no spec text, so we
recover them from the system codec libraries and VALIDATE them
structurally before emitting the header:

* Huffman tables come from libmp3lame's encoder-side forward tables
  (the ``ht[]`` record array in .data.rel.ro, located via its
  R_X86_64_RELATIVE relocation layout).  LAME stores *cost* lengths
  (true length + one sign bit per nonzero value, + linbits cost on some
  variants) and, for the count1 quads, code words left-shifted by the
  sign count; both conventions are inverted here.  Every emitted table
  must pass the Kraft *equality* (complete prefix code: sum 2^-len == 1)
  and pairwise prefix-freeness — a 256-entry table cannot pass by
  accident, so passing pins the offsets, conventions, and (via the
  spec's known size/linbits geometry + address ordering) table identity.
* The synthesis window comes from libmpg123's ``intwinbase`` half-table
  (257 int64 values, the ISO decimal table times 65536), located by its
  unmistakable shape (0, -1, -1, -1, ... peak 75038) in .rodata.

Decode correctness of the emitted header is additionally pinned by
tests/test_mp3.py: fixtures encoded through libmp3lame round-trip
through the native decoder against the independent libmpg123 oracle.

Run: python3 native/extract_mp3_tables.py native/mp3_tables.h
"""

import struct
import sys

LAME = "/usr/lib/x86_64-linux-gnu/libmp3lame.so.0.0.0"
MPG123 = "/usr/lib/x86_64-linux-gnu/libmpg123.so.0.47.0"

# Spec-fixed geometry (ISO 11172-3 Table B.7): table id -> (xlen, ylen).
# Tables 17-23 reuse table 16's codes, 25-31 reuse 24's; 0/4/14 are empty.
PAIR_IDS = [1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 15, 16, 24]
PAIR_XLEN = {1: 2, 2: 3, 3: 3, 5: 4, 6: 4, 7: 6, 8: 6, 9: 6,
             10: 8, 11: 8, 12: 8, 13: 16, 15: 16, 16: 16, 24: 16}
LINBITS = [0] * 16 + [1, 2, 3, 4, 6, 8, 10, 13, 4, 5, 6, 7, 8, 9, 11, 13]


def elf_sections(f):
    assert f[:4] == b"\x7fELF" and f[4] == 2, "need ELF64"
    e_shoff = struct.unpack_from("<Q", f, 0x28)[0]
    e_shentsize = struct.unpack_from("<H", f, 0x3a)[0]
    e_shnum = struct.unpack_from("<H", f, 0x3c)[0]
    e_shstrndx = struct.unpack_from("<H", f, 0x3e)[0]
    raw = [struct.unpack_from("<IIQQQQIIQQ", f, e_shoff + i * e_shentsize)
           for i in range(e_shnum)]
    shstr = raw[e_shstrndx][4]
    secs = {}
    for v in raw:
        end = f.index(b"\0", shstr + v[0])
        secs[f[shstr + v[0]:end].decode()] = v
    return secs


def va_to_off(secs, va):
    for s in secs.values():
        if s[1] != 8 and s[3] <= va < s[3] + s[5]:  # not SHT_NOBITS
            return s[4] + (va - s[3])
    raise ValueError(hex(va))


def is_complete_prefix(codes, lens):
    """Complete prefix code: Kraft equality + pairwise prefix-freeness."""
    if any(l < 1 or l > 19 for l in lens):
        return False
    if abs(sum(2.0 ** -l for l in lens) - 1.0) > 1e-9:
        return False
    by = sorted(zip(codes, lens), key=lambda t: t[1])
    for i, (c, l) in enumerate(by):
        if c >= (1 << l):
            return False
        for c2, l2 in by[i + 1:]:
            if l2 > l and (c2 >> (l2 - l)) == c:
                return False
    return len(set(by)) == len(lens)


def extract_pair_tables():
    f = open(LAME, "rb").read()
    secs = elf_sections(f)
    rela = secs[".rela.dyn"]
    relocs = {}
    for o in range(rela[4], rela[4] + rela[5], 24):
        r_off, r_info, r_add = struct.unpack_from("<QQq", f, o)
        if (r_info & 0xFFFFFFFF) == 8:  # R_X86_64_RELATIVE
            relocs[r_off] = r_add
    drr = secs[".data.rel.ro"]
    ptr_pairs = []  # adjacent relocated qwords: (codes*, hlen*) candidates
    for va in range(drr[3], drr[3] + drr[5] - 8, 8):
        if va in relocs and (va + 8) in relocs:
            ptr_pairs.append((relocs[va], relocs[va + 8]))

    def u16s(va, n):
        return list(struct.unpack_from("<%dH" % n, f, va_to_off(secs, va)))

    def u8s(va, n):
        return list(struct.unpack_from("<%dB" % n, f, va_to_off(secs, va)))

    def true_lens(cost, xlen, sub_linbits):
        lens = []
        for i in range(xlen * xlen):
            x, y = divmod(i, xlen)
            l = cost[i] - (1 if x else 0) - (1 if y else 0)
            l -= sub_linbits * ((1 if x == 15 else 0) + (1 if y == 15 else 0))
            lens.append(l)
        return lens

    # Validate every candidate pair against every geometry; LAME stores
    # some escape-table cost arrays with linbits included, some without —
    # accept whichever subtraction yields a valid code.
    hits = []  # (codes_va, xlen, codes, lens)
    seen_codes_va = set()
    for codes_va, hlen_va in ptr_pairs:
        for xlen in (2, 3, 4, 6, 8, 16):
            n = xlen * xlen
            try:
                codes = u16s(codes_va, n)
                cost = u8s(hlen_va, n)
            except ValueError:
                continue
            for sub in (0, 1, 4):
                lens = true_lens(cost, xlen, sub)
                if is_complete_prefix(codes, lens):
                    if codes_va not in seen_codes_va:
                        seen_codes_va.add(codes_va)
                        hits.append((codes_va, xlen, codes, lens))
                    break
            else:
                continue
            break

    # LAME lays the code arrays out in descending address = ascending
    # table id; group by geometry and assign per the spec's size list.
    by_geom = {}
    for codes_va, xlen, codes, lens in hits:
        by_geom.setdefault(xlen, []).append((codes_va, codes, lens))
    for g in by_geom.values():
        g.sort(key=lambda t: -t[0])
    tables = {}
    idx_in_geom = {}
    for tid in PAIR_IDS:
        xlen = PAIR_XLEN[tid]
        k = idx_in_geom.get(xlen, 0)
        idx_in_geom[xlen] = k + 1
        got = by_geom.get(xlen, [])
        if k >= len(got):
            raise SystemExit(f"table {tid}: no validated candidate (geom {xlen})")
        _, codes, lens = got[k]
        tables[tid] = (codes, lens)
    # Identity cross-checks fixed by the spec itself.
    assert tables[1] == ([1, 1, 1, 0], [1, 3, 2, 3]), tables[1]
    assert max(tables[13][1]) == 19, "t13 max code length must be 19"
    assert max(tables[15][1]) == 13, "t15 max code length must be 13"
    assert tables[16][1][0] == 1 and max(tables[16][1]) == 17
    assert tables[24][1][0] == 4 and max(tables[24][1]) <= 12
    return f, secs, tables, ptr_pairs, u16s, u8s


def extract_quads(f, secs, ptr_pairs, u16s, u8s):
    """count1 tables A/B: 16 quads; stored codes are left-shifted by the
    sign count and stored lens include it."""
    quads = []
    for codes_va, hlen_va in ptr_pairs:
        try:
            raw_c = u16s(codes_va, 16)
            raw_l = u8s(hlen_va, 16)
        except ValueError:
            continue
        codes, lens = [], []
        ok = True
        for i in range(16):
            s = bin(i).count("1")
            l = raw_l[i] - s
            c = raw_c[i] >> s
            if l < 1 or l > 10 or (raw_c[i] & ((1 << s) - 1)):
                ok = False
                break
            codes.append(c)
            lens.append(l)
        if ok and is_complete_prefix(codes, lens):
            if (codes, lens) not in [(c, l) for _, c, l in quads]:
                quads.append((codes_va, codes, lens))
    # Table B is the fixed 4-bit code 15 - i; table A is the other one.
    tab_b = [q for q in quads if q[1] == [15 - i for i in range(16)]]
    tab_a = [q for q in quads if q not in tab_b]
    assert len(tab_b) == 1 and len(tab_a) >= 1, (len(tab_a), len(tab_b))
    # If multiple A candidates survived, the true one sits at the higher
    # address adjacent to B (ht[32] precedes ht[33] in layout).
    tab_a.sort(key=lambda t: -t[0])
    return tab_a[0][1], tab_a[0][2], tab_b[0][1], tab_b[0][2]


def extract_sfb_tables():
    """Scalefactor band boundaries (ISO 11172-3 Table B.8 + ISO 13818-3)
    for all nine MPEG-1/2/2.5 rates.

    Located in libmp3lame's .rodata as adjacent (long[23], short[14])
    ascending-int pairs ending 576/192, laid out in LAME's sfBandIndex
    order [22050, 24000, 16000, 44100, 48000, 32000, 11025, 12000, 8000];
    identified by per-rate unique anchors."""
    f = open(LAME, "rb").read()
    secs = elf_sections(f)
    ro = secs[".rodata"]
    data = f[ro[4]:ro[4] + ro[5]]
    n = len(data) // 4
    vals = struct.unpack_from("<%di" % n, data)
    runs = []
    i = 0
    while i < n:
        if vals[i] == 0 and i + 5 < n and vals[i + 1] in (4, 6, 8, 12):
            j = i + 1
            while j < n and 0 < vals[j] <= 576 and vals[j] > vals[j - 1]:
                j += 1
            run = list(vals[i:j])
            if run[-1] in (576, 192) and len(run) in (14, 23):
                runs.append((i, run))
            i = j
        else:
            i += 1
    pairs = []
    for k in range(len(runs) - 1):
        if len(runs[k][1]) == 23 and len(runs[k + 1][1]) == 14:
            pairs.append((runs[k][1], runs[k + 1][1]))
    lame_order = [22050, 24000, 16000, 44100, 48000, 32000, 11025, 12000, 8000]
    assert len(pairs) >= 9, len(pairs)
    out = dict(zip(lame_order, pairs[:9]))
    # Identity anchors fixed by the spec.
    assert out[44100][1] == [0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192]
    assert out[48000][0][9:13] == [42, 50, 60, 72]
    assert 418 in out[44100][0] and 550 in out[32000][0]
    assert 522 in out[22050][0] and 540 in out[24000][0]
    assert 568 in out[8000][0] and out[8000][0][1] == 12
    return out


def extract_window():
    f = open(MPG123, "rb").read()
    secs = elf_sections(f)
    ro = secs[".rodata"]
    data = f[ro[4]:ro[4] + ro[5]]
    n = len(data) // 8
    vals = struct.unpack_from("<%dq" % n, data)
    for i in range(n - 257):
        if (vals[i] == 0 and vals[i + 1] == -1 and vals[i + 2] == -1
                and vals[i + 3] == -1 and vals[i + 256] == 75038):
            run = list(vals[i:i + 257])
            if all(abs(v) <= 75038 for v in run):
                return run
    raise SystemExit("intwinbase not found in libmpg123")


def emit(out):
    f, secs, tables, ptr_pairs, u16s, u8s = extract_pair_tables()
    a_c, a_l, b_c, b_l = extract_quads(f, secs, ptr_pairs, u16s, u8s)
    win = extract_window()
    sfb = extract_sfb_tables()

    w = out.write
    w("// Generated by extract_mp3_tables.py — ISO 11172-3 Layer III\n")
    w("// constants (Huffman code tables, synthesis window), recovered from\n")
    w("// the system codec libraries and structurally validated (complete\n")
    w("// prefix codes; window identity 0..75038/65536).  Do not edit.\n")
    w("#pragma once\n#include <cstdint>\n\n")
    for tid in PAIR_IDS:
        codes, lens = tables[tid]
        w(f"static const uint16_t kHuffCodes{tid}[{len(codes)}] = {{")
        w(",".join(str(c) for c in codes))
        w("};\n")
        w(f"static const uint8_t kHuffLens{tid}[{len(lens)}] = {{")
        w(",".join(str(l) for l in lens))
        w("};\n")
    w(f"static const uint16_t kQuadCodesA[16] = {{{','.join(map(str, a_c))}}};\n")
    w(f"static const uint8_t kQuadLensA[16] = {{{','.join(map(str, a_l))}}};\n")
    w(f"static const uint16_t kQuadCodesB[16] = {{{','.join(map(str, b_c))}}};\n")
    w(f"static const uint8_t kQuadLensB[16] = {{{','.join(map(str, b_l))}}};\n\n")
    w("// Per-table (codes, lens, xlen, linbits); ids 17-23 share 16's\n")
    w("// codes, 25-31 share 24's (ISO Table B.7).\n")
    w("struct HuffTab { const uint16_t* codes; const uint8_t* lens;\n"
      "                 uint8_t xlen; uint8_t linbits; };\n")
    w("static const HuffTab kHuffTabs[32] = {\n")
    for tid in range(32):
        src = tid
        if 17 <= tid <= 23:
            src = 16
        elif 25 <= tid <= 31:
            src = 24
        if src in PAIR_XLEN:
            w(f"  {{kHuffCodes{src}, kHuffLens{src}, {PAIR_XLEN[src]}, "
              f"{LINBITS[tid]}}},\n")
        else:
            w("  {nullptr, nullptr, 0, 0},\n")
    w("};\n\n")
    w("// Scalefactor band boundaries (ISO 11172-3 B.8 / ISO 13818-3):\n")
    w("// rows 0-2 MPEG-1 (44100, 48000, 32000), 3-5 MPEG-2 (22050, 24000,\n")
    w("// 16000), 6-8 MPEG-2.5 (11025, 12000, 8000) — header sr_index\n")
    w("// order within each version.\n")
    rates = [44100, 48000, 32000, 22050, 24000, 16000, 11025, 12000, 8000]
    for name, idx_rate in (("Long", 0), ("Short", 1)):
        dim = 23 if name == "Long" else 14
        w(f"static const int16_t kSfb{name}[9][{dim}] = {{\n")
        for r in rates:
            w("  {" + ",".join(str(v) for v in sfb[r][idx_rate]) + "},\n")
        w("};\n")
    w("\n")
    w("// Synthesis window half-table: D[i] * 65536 for i = 0..256; the\n")
    w("// full 512-tap window follows by mirror symmetry (mp3_decode.cpp).\n")
    w(f"static const int32_t kWinBase[257] = {{\n")
    for i in range(0, 257, 10):
        w("  " + ",".join(str(v) for v in win[i:i + 10]) + ",\n")
    w("};\n")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as fh:
            emit(fh)
        print(f"wrote {sys.argv[1]}", file=sys.stderr)
    else:
        emit(sys.stdout)
