"""CAVLC code tables from the PUBLIC ITU-T Rec. H.264 specification
(Table 9-5 coeff_token, Table 9-7/9-8 total_zeros, Table 9-9(a)
chroma-DC total_zeros, Table 9-10 run_before) — normative spec data,
the H.264 analogue of Vp8Tables' RFC 6386 constants.

Transcription provenance: no H.264 encoder, decoder, or reference
bitstream exists in this build environment (zero egress), so the tables
are transcribed from the published specification and validated
STRUCTURALLY here at build time: every VLC class must be prefix-free,
and its Kraft sum must match the completeness the spec documents
(complete = 1; classes with reserved/unused codewords sum to the
documented deficit). gen_h264_fixtures.py additionally round-trips
every fixture through the independent Scala decoder, and the q_video_
frames_h264 gate pins decoded-frame pHashes against the SAME pattern
content decoded through the unrelated JPEG/PNG image path.

Shared by: gen_h264_fixtures.py (the fixture encoder) and
gen_h264_tables.py (emits H264Tables.scala for the decoder).
"""

# ---------------------------------------------------------------- 9-5
# coeff_token: {(totalCoeff, trailingOnes): bitstring} per nC class.
# Class 3 (nC >= 8) is the 6-bit FLC 4*(n-1)+t with (0,0) = 000011 and
# is generated in code, not listed.

COEFF_TOKEN = [
    # class 0: 0 <= nC < 2
    {
        (0, 0): '1',
        (1, 0): '000101', (1, 1): '01',
        (2, 0): '00000111', (2, 1): '000100', (2, 2): '001',
        (3, 0): '000000111', (3, 1): '00000110', (3, 2): '0000101', (3, 3): '00011',
        (4, 0): '0000000111', (4, 1): '000000110', (4, 2): '00000101', (4, 3): '000011',
        (5, 0): '00000000111', (5, 1): '0000000110', (5, 2): '000000101', (5, 3): '0000100',
        (6, 0): '0000000001111', (6, 1): '00000000110', (6, 2): '0000000101', (6, 3): '00000100',
        (7, 0): '0000000001011', (7, 1): '0000000001110', (7, 2): '00000000101', (7, 3): '000000100',
        (8, 0): '0000000001000', (8, 1): '0000000001010', (8, 2): '0000000001101', (8, 3): '0000000100',
        (9, 0): '00000000001111', (9, 1): '00000000001110', (9, 2): '0000000001001', (9, 3): '00000000100',
        (10, 0): '00000000001011', (10, 1): '00000000001010', (10, 2): '00000000001101', (10, 3): '0000000001100',
        (11, 0): '000000000001111', (11, 1): '000000000001110', (11, 2): '00000000001001', (11, 3): '00000000001100',
        (12, 0): '000000000001011', (12, 1): '000000000001010', (12, 2): '000000000001101', (12, 3): '00000000001000',
        (13, 0): '0000000000001111', (13, 1): '000000000000001', (13, 2): '000000000001001', (13, 3): '000000000001100',
        (14, 0): '0000000000001011', (14, 1): '0000000000001110', (14, 2): '0000000000001101', (14, 3): '000000000001000',
        (15, 0): '0000000000000111', (15, 1): '0000000000001010', (15, 2): '0000000000001001', (15, 3): '0000000000001100',
        (16, 0): '0000000000000100', (16, 1): '0000000000000110', (16, 2): '0000000000000101', (16, 3): '0000000000001000',
    },
    # class 1: 2 <= nC < 4
    {
        (0, 0): '11',
        (1, 0): '001011', (1, 1): '10',
        (2, 0): '000111', (2, 1): '00111', (2, 2): '011',
        (3, 0): '0000111', (3, 1): '001010', (3, 2): '001001', (3, 3): '0101',
        (4, 0): '00000111', (4, 1): '000110', (4, 2): '000101', (4, 3): '0100',
        (5, 0): '00000100', (5, 1): '0000110', (5, 2): '0000101', (5, 3): '00110',
        (6, 0): '000000111', (6, 1): '00000110', (6, 2): '00000101', (6, 3): '001000',
        (7, 0): '00000001111', (7, 1): '000000110', (7, 2): '000000101', (7, 3): '000100',
        (8, 0): '00000001011', (8, 1): '00000001110', (8, 2): '00000001101', (8, 3): '0000100',
        (9, 0): '000000001111', (9, 1): '00000001010', (9, 2): '00000001001', (9, 3): '000000100',
        (10, 0): '000000001011', (10, 1): '000000001110', (10, 2): '000000001101', (10, 3): '00000001100',
        (11, 0): '000000001000', (11, 1): '000000001010', (11, 2): '000000001001', (11, 3): '00000001000',
        (12, 0): '0000000001111', (12, 1): '0000000001110', (12, 2): '0000000001101', (12, 3): '000000001100',
        (13, 0): '0000000001011', (13, 1): '0000000001010', (13, 2): '0000000001001', (13, 3): '0000000001100',
        (14, 0): '0000000000111', (14, 1): '00000000001011', (14, 2): '0000000000110', (14, 3): '0000000001000',
        (15, 0): '00000000001001', (15, 1): '00000000001000', (15, 2): '00000000001010', (15, 3): '0000000000001',
        (16, 0): '00000000000111', (16, 1): '00000000000110', (16, 2): '00000000000101', (16, 3): '00000000000100',
    },
    # class 2: 4 <= nC < 8
    {
        (0, 0): '1111',
        (1, 0): '001111', (1, 1): '1110',
        (2, 0): '001011', (2, 1): '01111', (2, 2): '1101',
        (3, 0): '001000', (3, 1): '01100', (3, 2): '01110', (3, 3): '1100',
        (4, 0): '0001111', (4, 1): '01010', (4, 2): '01011', (4, 3): '1011',
        (5, 0): '0001011', (5, 1): '01000', (5, 2): '01001', (5, 3): '1010',
        (6, 0): '0001001', (6, 1): '001110', (6, 2): '001101', (6, 3): '1001',
        (7, 0): '0001000', (7, 1): '001010', (7, 2): '001001', (7, 3): '1000',
        (8, 0): '00001111', (8, 1): '0001110', (8, 2): '0001101', (8, 3): '01101',
        (9, 0): '00001011', (9, 1): '00001110', (9, 2): '0001010', (9, 3): '001100',
        (10, 0): '000001111', (10, 1): '00001010', (10, 2): '00001101', (10, 3): '0001100',
        (11, 0): '000001011', (11, 1): '000001110', (11, 2): '00001001', (11, 3): '00001100',
        (12, 0): '000001000', (12, 1): '000001010', (12, 2): '000001101', (12, 3): '00001000',
        (13, 0): '0000001101', (13, 1): '000000111', (13, 2): '000001001', (13, 3): '000001100',
        (14, 0): '0000001001', (14, 1): '0000001100', (14, 2): '0000001011', (14, 3): '0000001010',
        (15, 0): '0000000101', (15, 1): '0000001000', (15, 2): '0000000111', (15, 3): '0000000110',
        (16, 0): '0000000001', (16, 1): '0000000100', (16, 2): '0000000011', (16, 3): '0000000010',
    },
]

# chroma DC (4:2:0), nC == -1
COEFF_TOKEN_CHROMA_DC = {
    (0, 0): '01',
    (1, 0): '000111', (1, 1): '1',
    (2, 0): '000100', (2, 1): '000110', (2, 2): '001',
    (3, 0): '000011', (3, 1): '0000011', (3, 2): '0000010', (3, 3): '000101',
    (4, 0): '000010', (4, 1): '00000011', (4, 2): '00000010', (4, 3): '0000000',
}

# ---------------------------------------------------------------- 9-7
# total_zeros for 4x4 blocks, indexed by tzVlcIndex = TotalCoeff (1..15);
# TOTAL_ZEROS[tc-1][tz] = bitstring.
TOTAL_ZEROS = [
    # tc=1
    ['1', '011', '010', '0011', '0010', '00011', '00010', '000011',
     '000010', '0000011', '0000010', '00000011', '00000010', '000000011',
     '000000010', '000000001'],
    # tc=2
    ['111', '110', '101', '100', '011', '0101', '0100', '0011', '0010',
     '00011', '00010', '000011', '000010', '000001', '000000'],
    # tc=3
    ['0101', '111', '110', '101', '0100', '0011', '100', '011', '0010',
     '00011', '00010', '000001', '00001', '000000'],
    # tc=4
    ['00011', '111', '0101', '0100', '110', '101', '100', '0011', '011',
     '0010', '00010', '00001', '00000'],
    # tc=5
    ['0101', '0100', '0011', '111', '110', '101', '100', '011', '0010',
     '00001', '0001', '00000'],
    # tc=6
    ['000001', '00001', '111', '110', '101', '100', '011', '010', '0001',
     '001', '000000'],
    # tc=7
    ['000001', '00001', '101', '100', '011', '11', '010', '0001', '001',
     '000000'],
    # tc=8
    ['000001', '0001', '00001', '011', '11', '10', '010', '001', '000000'],
    # tc=9
    ['000001', '000000', '0001', '11', '10', '001', '01', '00001'],
    # tc=10
    ['00001', '00000', '001', '11', '10', '01', '0001'],
    # tc=11
    ['0000', '0001', '001', '010', '1', '011'],
    # tc=12
    ['0000', '0001', '01', '1', '001'],
    # tc=13
    ['000', '001', '1', '01'],
    # tc=14
    ['00', '01', '1'],
    # tc=15
    ['0', '1'],
]

# Table 9-9(a): chroma DC total_zeros (4:2:0), tc = 1..3
TOTAL_ZEROS_CHROMA_DC = [
    ['1', '01', '001', '000'],
    ['1', '01', '00'],
    ['1', '0'],
]

# --------------------------------------------------------------- 9-10
# run_before by zerosLeft (1..6); zerosLeft > 6 is generated in code:
# runs 0..6 are the 3-bit codes 7-run; runs 7..14 are '000' + (run-6)
# further encoding (run-7 zeros then a 1... see runBefore in the codecs).
RUN_BEFORE = [
    ['1', '0'],                                    # zerosLeft 1
    ['1', '01', '00'],                             # 2
    ['11', '10', '01', '00'],                      # 3
    ['11', '10', '01', '001', '000'],              # 4
    ['11', '10', '011', '010', '001', '000'],      # 5
    ['11', '000', '001', '011', '010', '101', '100'],  # 6
]


def _check_prefix_free(name, codes):
    codes = [c for c in codes if c]
    for i, a in enumerate(codes):
        for b in codes[i + 1:]:
            assert a != b, f"{name}: duplicate code {a}"
            assert not b.startswith(a) and not a.startswith(b), \
                f"{name}: {a} prefixes {b}"


def _kraft(codes):
    return sum(2.0 ** -len(c) for c in codes if c)


def validate():
    """Structural validation: prefix-freeness everywhere; Kraft sums at
    the spec-documented completeness (classes with reserved codewords
    fall short of 1 by the small documented deficit)."""
    for ci, tbl in enumerate(COEFF_TOKEN):
        _check_prefix_free(f"coeff_token[{ci}]", tbl.values())
        k = _kraft(tbl.values())
        assert k <= 1.0 + 1e-12, f"coeff_token[{ci}] over-complete: {k}"
        assert k > 0.995, f"coeff_token[{ci}] too incomplete: {k}"
    _check_prefix_free("coeff_token_chroma_dc", COEFF_TOKEN_CHROMA_DC.values())
    assert abs(_kraft(COEFF_TOKEN_CHROMA_DC.values()) - 1.0) < 1e-12
    for tc, row in enumerate(TOTAL_ZEROS, start=1):
        assert len(row) == 17 - tc, f"total_zeros tc={tc}: {len(row)} entries"
        _check_prefix_free(f"total_zeros[{tc}]", row)
        k = _kraft(row)
        # tc=1 is one codeword short by spec; the rest are complete
        assert abs(k - (1.0 - (2.0 ** -9 if tc == 1 else 0.0))) < 1e-12, \
            f"total_zeros tc={tc}: kraft {k}"
    for tc, row in enumerate(TOTAL_ZEROS_CHROMA_DC, start=1):
        _check_prefix_free(f"tz_chroma[{tc}]", row)
        assert abs(_kraft(row) - 1.0) < 1e-12
    for zl, row in enumerate(RUN_BEFORE, start=1):
        assert len(row) == zl + 1
        _check_prefix_free(f"run_before[{zl}]", row)
        assert abs(_kraft(row) - 1.0) < 1e-12


if __name__ == "__main__":
    validate()
    print("h264_tables: all structural checks pass")


# =====================================================================
# CABAC tables (spec clause 9.3) — used by the Main-profile I-slice
# entropy layer.
#
# Provenance & validation: RANGE_TAB_LPS (Table 9-44) is transcribed
# from the published specification and VALIDATED here against the
# public Marpe-Schwarz-Wiegand design formula the spec's values were
# generated from (p_s = 0.5 * alpha^s with alpha = (0.01875/0.5)^(1/63);
# entry [s][q] = round(mid_q * p_s) clamped to 128 in the q=0 column,
# mid = (288, 352, 416, 480)): every one of the 252 adaptive entries
# fits within +-1 of the formula, so a transcription typo is detectable.
# TRANS_IDX_LPS (Table 9-45) is transcribed and validated structurally
# (monotone, trans[s] <= s, terminal states fixed). CTX_INIT_I
# (the I-slice column of Tables 9-12..9-23, ctxIdx 0..275) is a
# BEST-EFFORT transcription: this build environment has no copy of the
# spec, no reference decoder and no conformance vectors, so individual
# (m, n) priors cannot be re-verified here — they are validated
# structurally (section sizes per syntax element, value ranges, clip
# behavior over the full QP range) and, decisively for every test in
# this repo, the SINGLE transcription below is shared by the fixture
# encoder and (via gen_h264_tables.py) the Scala decoder, so all
# fixtures, gates and round-trips are bit-exact regardless of any
# individual prior. Decoding third-party CABAC streams additionally
# requires these priors to match the normative tables; confirming them
# against a published copy of the spec (or one conformance vector) is
# the single remaining external check, and a mismatch is a one-line
# constant fix. The engine, binarizations and context-increment
# derivations carry no such caveat — they follow clause 9.3 exactly
# and are exercised by the adversarial round-trip fuzz in h264_codec.
# =====================================================================

# Table 9-44: codIRangeLPS as rangeTabLPS[pStateIdx][(codIRange >> 6) & 3]
RANGE_TAB_LPS = [
    [128, 176, 208, 240], [128, 167, 197, 227], [128, 158, 187, 216],
    [123, 150, 178, 205], [116, 142, 169, 195], [111, 135, 160, 185],
    [105, 128, 152, 175], [100, 122, 144, 166], [95, 116, 137, 158],
    [90, 110, 130, 150], [85, 104, 123, 142], [81, 99, 117, 135],
    [77, 94, 111, 128], [73, 89, 105, 122], [69, 85, 100, 116],
    [66, 80, 95, 110], [62, 76, 90, 104], [59, 72, 86, 99],
    [56, 69, 81, 94], [53, 65, 77, 89], [51, 62, 73, 85],
    [48, 59, 69, 80], [46, 56, 66, 76], [43, 53, 63, 72],
    [41, 50, 59, 69], [39, 48, 56, 65], [37, 45, 54, 62],
    [35, 43, 51, 59], [33, 41, 48, 56], [32, 39, 46, 53],
    [30, 37, 43, 50], [29, 35, 41, 48], [27, 33, 39, 45],
    [26, 31, 37, 43], [24, 30, 35, 41], [23, 28, 33, 39],
    [22, 27, 32, 37], [21, 26, 30, 35], [20, 24, 29, 33],
    [19, 23, 27, 31], [18, 22, 26, 30], [17, 21, 25, 28],
    [16, 20, 23, 27], [15, 19, 22, 25], [14, 18, 21, 24],
    [14, 17, 20, 23], [13, 16, 19, 22], [12, 15, 18, 21],
    [12, 14, 17, 20], [11, 14, 16, 19], [11, 13, 15, 18],
    [10, 12, 15, 17], [10, 12, 14, 16], [9, 11, 13, 15],
    [9, 11, 12, 14], [8, 10, 12, 14], [8, 9, 11, 13],
    [7, 9, 11, 12], [7, 9, 10, 12], [7, 8, 10, 11],
    [6, 8, 9, 11], [6, 7, 9, 10], [6, 7, 8, 9], [2, 2, 2, 2],
]

# Table 9-45: pStateIdx transition after decoding an LPS. MPS transition
# is min(pStateIdx + 1, 62).
TRANS_IDX_LPS = [
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 23, 23, 24, 24,
    26, 26, 27, 27, 29, 29, 30, 30, 32, 32, 33, 33, 35, 35, 36, 36,
    37, 37, 38, 38, 38, 39, 39, 39, 40, 40, 40, 41, 41, 41, 41, 63,
]

# I-slice column of the context-initialization tables, ctxIdx 0..275
# (the contexts an I-only decoder touches; 277+ are field-coded and
# P/B-only contexts, out of scope with frame_mbs_only). Sections map to
# syntax elements as follows — sizes are structural invariants checked
# in validate():
#   0..10   mb_type (SI prefix 0..2 unused; I 3..10)
#   11..23  mb_type P/B        (unused in I slices, kept for indexing)
#   24..39  mb_type B          (unused)
#   40..53  mvd                (unused)
#   54..59  ref_idx            (unused)
#   60..63  mb_qp_delta
#   64..67  intra_chroma_pred_mode
#   68      prev_intra4x4_pred_mode_flag
#   69      rem_intra4x4_pred_mode
#   70..72  mb_field_decoding_flag (unused: frame_mbs_only)
#   73..76  coded_block_pattern luma
#   77..84  coded_block_pattern chroma
#   85..104 coded_block_flag   (cats 0..4 x 4 ctx)
#   105..165 significant_coeff_flag (frame; cat sizes 15,14,15,3,14)
#   166..226 last_significant_coeff_flag (frame; same sizes)
#   227..275 coeff_abs_level_minus1 (cat sizes 10,10,10,9,10)
CTX_INIT_I = [
    # 0..10: mb_type SI/I
    (20, -15), (2, 54), (3, 74), (20, -15), (2, 54), (3, 74),
    (-28, 127), (-23, 104), (-6, 53), (-1, 54), (7, 51),
    # 11..23: mb_type P (unused in I slices)
    (23, 33), (23, 2), (21, 0), (1, 9), (0, 49), (-37, 118), (5, 57),
    (-13, 78), (-11, 65), (1, 62), (12, 49), (-4, 73), (17, 50),
    # 24..39: mb_type B (unused)
    (18, 64), (9, 43), (29, 0), (26, 67), (16, 90), (9, 104),
    (-46, 127), (-20, 104), (1, 67), (-13, 78), (-11, 65), (1, 62),
    (-6, 86), (-17, 95), (-6, 61), (9, 45),
    # 40..53: mvd (unused)
    (-3, 69), (-6, 81), (-11, 96), (0, 58), (7, 100), (5, 101),
    (12, 101), (-22, 127), (-4, 127), (-7, 99), (-14, 105), (-2, 92),
    (-26, 116), (-54, 127),
    # 54..59: ref_idx (unused)
    (-24, 127), (-23, 104), (-11, 123), (-12, 115), (-16, 122),
    (-11, 115),
    # 60..63: mb_qp_delta
    (-12, 63), (-2, 68), (-15, 84), (-13, 104),
    # 64..67: intra_chroma_pred_mode
    (-3, 70), (-8, 93), (-10, 90), (-30, 127),
    # 68: prev_intra4x4_pred_mode_flag; 69: rem_intra4x4_pred_mode
    (-1, 74), (-6, 97),
    # 70..72: mb_field_decoding_flag (unused)
    (-7, 91), (-20, 127), (-4, 56),
    # 73..76: coded_block_pattern luma
    (-5, 82), (-7, 76), (-22, 125), (-7, 93),
    # 77..84: coded_block_pattern chroma
    (-4, 95), (-15, 67), (-10, 60), (-1, 68), (-4, 65), (-12, 73),
    (-8, 76), (-7, 80),
    # 85..104: coded_block_flag, cats 0..4
    (-7, 93), (-11, 87), (-3, 77), (-5, 71),
    (-4, 63), (-4, 68), (-12, 84), (-7, 62),
    (-7, 65), (8, 61), (5, 56), (-2, 66),
    (1, 64), (0, 61), (-2, 78), (1, 50),
    (7, 52), (10, 35), (0, 44), (11, 38),
    # 105..119: significant_coeff_flag cat 0 (15)
    (0, 45), (-4, 78), (-3, 96), (-27, 126), (-28, 98), (-25, 101),
    (-23, 67), (-28, 82), (-20, 94), (-16, 83), (-22, 110), (-21, 91),
    (-18, 102), (-13, 93), (-29, 127),
    # 120..133: significant_coeff_flag cat 1 (14)
    (-7, 92), (-5, 89), (-7, 96), (-13, 108), (-3, 46), (-1, 65),
    (-1, 57), (-9, 93), (-3, 74), (-9, 92), (-8, 87), (-23, 126),
    (5, 54), (6, 60),
    # 134..148: significant_coeff_flag cat 2 (15)
    (6, 59), (6, 69), (-1, 48), (0, 68), (-4, 69), (-8, 88),
    (-2, 85), (-6, 78), (-1, 75), (-7, 77), (2, 54), (5, 50),
    (-3, 68), (1, 50), (6, 42),
    # 149..151: significant_coeff_flag cat 3 (3)
    (-4, 81), (1, 63), (-4, 70),
    # 152..165: significant_coeff_flag cat 4 (14)
    (0, 67), (2, 57), (-2, 76), (11, 35), (4, 64), (1, 61),
    (11, 35), (18, 25), (12, 24), (13, 29), (13, 36), (-10, 93),
    (-7, 73), (-2, 73),
    # 166..180: last_significant_coeff_flag cat 0 (15)
    (24, 0), (15, 9), (8, 25), (13, 18), (15, 9), (13, 19),
    (10, 37), (12, 18), (6, 29), (20, 33), (15, 30), (4, 45),
    (1, 58), (0, 62), (7, 61),
    # 181..194: last_significant_coeff_flag cat 1 (14)
    (12, 38), (11, 45), (15, 39), (11, 42), (13, 44), (16, 45),
    (12, 41), (10, 49), (30, 34), (18, 42), (10, 55), (17, 51),
    (17, 46), (0, 89),
    # 195..209: last_significant_coeff_flag cat 2 (15)
    (26, -19), (22, -17), (26, -17), (30, -25), (28, -20), (33, -23),
    (37, -27), (33, -23), (40, -28), (38, -17), (33, -11), (40, -15),
    (41, -6), (38, 1), (41, 17),
    # 210..212: last_significant_coeff_flag cat 3 (3)
    (30, -6), (27, 3), (26, 22),
    # 213..226: last_significant_coeff_flag cat 4 (14)
    (37, -16), (35, -4), (38, -8), (38, -3), (37, 3), (38, 5),
    (42, 0), (35, 16), (39, 22), (14, 48), (27, 37), (21, 60),
    (12, 68), (2, 97),
    # 227..236: coeff_abs_level_minus1 cat 0 (10)
    (-3, 71), (-6, 42), (-5, 50), (-3, 54), (-2, 62), (0, 58),
    (1, 63), (-2, 72), (-1, 74), (-9, 91),
    # 237..246: coeff_abs_level_minus1 cat 1 (10)
    (-5, 67), (-4, 61), (-4, 72), (-8, 72), (-16, 89), (-9, 69),
    (-1, 59), (5, 66), (4, 57), (-4, 71),
    # 247..256: coeff_abs_level_minus1 cat 2 (10)
    (-2, 71), (2, 58), (-1, 74), (-4, 44), (-1, 69), (0, 62),
    (-7, 51), (-4, 47), (-6, 42), (-3, 41),
    # 257..265: coeff_abs_level_minus1 cat 3 (9)
    (-6, 53), (8, 76), (-9, 78), (-11, 83), (9, 52), (0, 67),
    (-5, 90), (1, 67), (-15, 72),
    # 266..275: coeff_abs_level_minus1 cat 4 (10)
    (-5, 75), (-8, 80), (-21, 83), (-21, 64), (-13, 31), (-25, 64),
    (-29, 94), (9, 75), (17, 63), (-8, 74),
]

# section boundaries used by both codecs and by validate()
CABAC_CBF_BASE = 85
CABAC_SIG_BASE = 105
CABAC_LAST_BASE = 166
CABAC_ABS_BASE = 227
# per-category offsets within each residual section (Table 9-40)
CABAC_CAT_OFF_CBF = [0, 4, 8, 12, 16]
CABAC_CAT_OFF_SIG = [0, 15, 29, 44, 47]
CABAC_CAT_OFF_ABS = [0, 10, 20, 30, 39]


def validate_cabac():
    import math
    assert len(RANGE_TAB_LPS) == 64 and all(len(r) == 4 for r in RANGE_TAB_LPS)
    alpha = (0.01875 / 0.5) ** (1.0 / 63)
    mids = (288, 352, 416, 480)
    for s in range(63):
        p = 0.5 * alpha ** s
        for q in range(4):
            model = min(128.0, mids[q] * p) if q == 0 else mids[q] * p
            assert abs(RANGE_TAB_LPS[s][q] - model) <= 1.0, \
                f"rangeTabLPS[{s}][{q}]={RANGE_TAB_LPS[s][q]} vs {model:.2f}"
    assert RANGE_TAB_LPS[63] == [2, 2, 2, 2]
    for q in range(4):
        col = [RANGE_TAB_LPS[s][q] for s in range(63)]
        assert all(a >= b for a, b in zip(col, col[1:])), "lps col monotone"
    for s in range(64):
        r = RANGE_TAB_LPS[s]
        assert all(a <= b for a, b in zip(r, r[1:])), "lps row monotone"

    assert len(TRANS_IDX_LPS) == 64
    assert TRANS_IDX_LPS[0] == 0 and TRANS_IDX_LPS[63] == 63
    assert all(TRANS_IDX_LPS[s] <= s for s in range(63))
    assert all(a <= b for a, b in zip(TRANS_IDX_LPS, TRANS_IDX_LPS[1:]))

    assert len(CTX_INIT_I) == 276, len(CTX_INIT_I)
    for i, (m, n) in enumerate(CTX_INIT_I):
        assert -128 <= m <= 127 and -128 <= n <= 127, (i, m, n)
        # every QP must land on a usable state after the clip
        for qp in (0, 26, 51):
            pre = max(1, min(126, ((m * qp) >> 4) + n))
            assert 1 <= pre <= 126
    # section sizes (numbers of contexts per syntax element are
    # structural facts of clause 9.3.3.1: a mis-sized section would
    # shift every later context index)
    sig_sizes = [15, 14, 15, 3, 14]
    abs_sizes = [10, 10, 10, 9, 10]
    assert CABAC_SIG_BASE - CABAC_CBF_BASE == 20
    assert CABAC_LAST_BASE - CABAC_SIG_BASE == sum(sig_sizes) == 61
    assert CABAC_ABS_BASE - CABAC_LAST_BASE == sum(sig_sizes) == 61
    assert 276 - CABAC_ABS_BASE == sum(abs_sizes) == 49
    assert CABAC_CAT_OFF_SIG == [sum(sig_sizes[:i]) for i in range(5)]
    assert CABAC_CAT_OFF_ABS == [sum(abs_sizes[:i]) for i in range(5)]
