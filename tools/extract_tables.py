#!/usr/bin/env python3
"""Generate libvpx_opencl_tpu/ops/tables.py — the normative VP8 constant tables.

VP8's constant tables (coefficient trees/probabilities, zig-zag order, quantizer
lookups, sub-pel filter taps, MV entropy contexts...) are *normative*: every
conforming implementation carries bit-identical copies (they are reproduced in
RFC 6386). We extract them mechanically from the reference sources:

  * literal integer arrays are parsed out of the C text (parser below);
  * tables the reference *computes at init time* (default mode probabilities,
    via vp8_tree_probs_from_distribution — entropymode.c:182-250) are dumped by
    tools' dump_tables.c linked against the built reference library, landing in
    /tmp/dump/computed_tables.json.

Run from repo root:  python tools/extract_tables.py
"""
import json
import os
import re

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "libvpx_opencl_tpu", "ops", "tables.py")


def strip_comments(text):
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    text = re.sub(r"//[^\n]*", " ", text)
    return text


def parse_array(path, name, shape):
    """Extract the integer literals of C array `name` from file `path`."""
    with open(os.path.join(REF, path)) as f:
        text = f.read()
    # find the declaration (allow DECLARE_ALIGNED wrapper or plain decl)
    m = re.search(re.escape(name) + r"\s*(\[[^=]*)?\)?\s*=", text)
    if not m:
        raise SystemExit(f"{name} not found in {path}")
    start = text.index("{", m.end())
    depth, i = 0, start
    while True:
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                break
        i += 1
    body = strip_comments(text[start:i + 1])
    # map enum identifiers used inside tree tables to their token values
    for ident, val in ENUMS.items():
        body = re.sub(r"\b" + ident + r"\b", str(val), body)
    nums = [int(x) for x in re.findall(r"-?\d+", body)]
    arr = np.array(nums, dtype=np.int64).reshape(shape)
    return arr


# Identifiers appearing inside table initializers (tree leaves are -token).
# Values from the reference enums:
#   entropy.h:63-80 (coef tokens), blockd.h MB_PREDICTION_MODE (blockd.h:73-103),
#   B_PREDICTION_MODE (blockd.h:105-135).
ENUMS = {
    "ZERO_TOKEN": 0, "ONE_TOKEN": 1, "TWO_TOKEN": 2, "THREE_TOKEN": 3,
    "FOUR_TOKEN": 4, "DCT_VAL_CATEGORY1": 5, "DCT_VAL_CATEGORY2": 6,
    "DCT_VAL_CATEGORY3": 7, "DCT_VAL_CATEGORY4": 8, "DCT_VAL_CATEGORY5": 9,
    "DCT_VAL_CATEGORY6": 10, "DCT_EOB_TOKEN": 11,
    "DC_PRED": 0, "V_PRED": 1, "H_PRED": 2, "TM_PRED": 3, "B_PRED": 4,
    "NEARESTMV": 5, "NEARMV": 6, "ZEROMV": 7, "NEWMV": 8, "SPLITMV": 9,
    "B_DC_PRED": 0, "B_TM_PRED": 1, "B_VE_PRED": 2, "B_HE_PRED": 3,
    "B_LD_PRED": 4, "B_RD_PRED": 5, "B_VR_PRED": 6, "B_VL_PRED": 7,
    "B_HD_PRED": 8, "B_HU_PRED": 9,
    "LEFT4X4": 10, "ABOVE4X4": 11, "ZERO4X4": 12, "NEW4X4": 13,
}

SPECS = [
    # (python name, reference path, C symbol, shape, citation note)
    ("COEF_BANDS", "vp8/common/entropy.c", "vp8_coef_bands", (16,),
     "entropy.c:50"),
    ("ZIGZAG", "vp8/common/entropy.c", "vp8_default_zig_zag1d", (16,),
     "entropy.c:56"),
    ("COEF_TREE", "vp8/common/entropy.c", "vp8_coef_tree", (22,),
     "entropy.c:78"),
    ("PREV_TOKEN_CLASS", "vp8/common/entropy.c", "vp8_prev_token_class", (12,),
     "entropy.c:53"),
    ("PCAT1", "vp8/common/entropy.c", "Pcat1", (1,), "entropy.c:98"),
    ("PCAT2", "vp8/common/entropy.c", "Pcat2", (2,), "entropy.c:99"),
    ("PCAT3", "vp8/common/entropy.c", "Pcat3", (3,), "entropy.c:100"),
    ("PCAT4", "vp8/common/entropy.c", "Pcat4", (4,), "entropy.c:101"),
    ("PCAT5", "vp8/common/entropy.c", "Pcat5", (5,), "entropy.c:102"),
    ("PCAT6", "vp8/common/entropy.c", "Pcat6", (11,), "entropy.c:103"),
    ("DEFAULT_COEF_PROBS", "vp8/common/default_coef_probs.h",
     "default_coef_probs", (4, 8, 3, 11), "default_coef_probs.h"),
    ("COEF_UPDATE_PROBS", "vp8/common/coefupdateprobs.h",
     "vp8_coef_update_probs", (4, 8, 3, 11), "coefupdateprobs.h"),
    ("BMODE_TREE", "vp8/common/entropymode.c", "vp8_bmode_tree", (18,),
     "entropymode.c:97"),
    ("YMODE_TREE", "vp8/common/entropymode.c", "vp8_ymode_tree", (8,),
     "entropymode.c:113"),
    ("KF_YMODE_TREE", "vp8/common/entropymode.c", "vp8_kf_ymode_tree", (8,),
     "entropymode.c:121"),
    ("UV_MODE_TREE", "vp8/common/entropymode.c", "vp8_uv_mode_tree", (6,),
     "entropymode.c:129"),
    ("MBSPLIT_TREE", "vp8/common/entropymode.c", "vp8_mbsplit_tree", (6,),
     "entropymode.c:136"),
    ("MV_REF_TREE", "vp8/common/entropymode.c", "vp8_mv_ref_tree", (8,),
     "entropymode.c:143"),
    ("SUB_MV_REF_TREE", "vp8/common/entropymode.c", "vp8_sub_mv_ref_tree",
     (6,), "entropymode.c:151"),
    ("SMALL_MV_TREE", "vp8/common/entropymode.c", "vp8_small_mvtree", (14,),
     "entropymode.c:169"),
    ("MBSPLITS", "vp8/common/entropymode.c", "vp8_mbsplits", (4, 16),
     "entropymode.c:55"),
    ("MBSPLIT_COUNT", "vp8/common/entropymode.c", "vp8_mbsplit_count", (4,),
     "entropymode.c:90"),
    ("MBSPLIT_PROBS", "vp8/common/entropymode.c", "vp8_mbsplit_probs", (3,),
     "entropymode.c:92"),
    ("SUB_MV_REF_PROB2", "vp8/common/entropymode.c", "vp8_sub_mv_ref_prob2",
     (5, 3), "entropymode.c:51"),
    ("MV_UPDATE_PROBS", "vp8/common/entropymv.c", "vp8_mv_update_probs",
     (2, 19), "entropymv.c:14"),
    ("DEFAULT_MV_CONTEXT", "vp8/common/entropymv.c", "vp8_default_mv_context",
     (2, 19), "entropymv.c:29"),
    ("MODE_CONTEXTS", "vp8/common/modecont.c", "vp8_mode_contexts", (6, 4),
     "modecont.c:14"),
    ("DC_QLOOKUP", "vp8/common/quant_common.c", "dc_qlookup", (128,),
     "quant_common.c:14"),
    ("AC_QLOOKUP", "vp8/common/quant_common.c", "ac_qlookup", (128,),
     "quant_common.c:26"),
    ("BILINEAR_FILTERS", "vp8/common/filter.c", "vp8_bilinear_filters",
     (8, 2), "filter.c:16"),
    ("SUBPEL_FILTERS", "vp8/common/filter.c", "vp8_sub_pel_filters", (8, 6),
     "filter.c:28"),
]


def fmt(arr):
    return np.array2string(arr, separator=", ", threshold=1 << 30,
                           max_line_width=78)


def main():
    with open("/tmp/dump/computed_tables.json") as f:
        computed = json.load(f)

    lines = [
        '"""Normative VP8 constant tables (auto-generated — do not edit).',
        "",
        "Generated by tools/extract_tables.py from the reference sources",
        "(/root/reference/vp8/common/...) and tools' C dumper for the",
        "init-time-computed default mode probabilities (entropymode.c:182-250).",
        "These constants are normative per RFC 6386; all conforming VP8",
        "implementations carry identical values.",
        '"""',
        "import numpy as np",
        "",
    ]
    for pyname, path, sym, shape, cite in SPECS:
        arr = parse_array(path, sym, shape)
        lines.append(f"# {sym} — {cite}")
        lines.append(f"{pyname} = np.array({fmt(arr)}, dtype=np.int32)")
        lines.append("")
    for key in ["ymode_prob", "kf_ymode_prob", "uv_mode_prob",
                "kf_uv_mode_prob", "sub_mv_ref_prob", "bmode_prob",
                "kf_bmode_prob"]:
        arr = np.array(computed[key], dtype=np.int32)
        lines.append(f"# default {key} — computed at init, entropymode.c:182-250")
        lines.append(f"{key.upper()} = np.array({fmt(arr)}, dtype=np.int32)")
        lines.append("")
    # derived: vp8_norm table (leading-zero renormalization shift counts,
    # entropy.c:30 — derivable: norm[n] = 7 - floor(log2(n)) for n>=1, norm[0]=0)
    lines.append("# vp8_norm — entropy.c:30 (shift to renormalize bool-decoder range)")
    lines.append("NORM = np.array([0] + [7 - int(n).bit_length() + 1"
                 " for n in range(1, 256)], dtype=np.int32)")
    lines.append("")
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
