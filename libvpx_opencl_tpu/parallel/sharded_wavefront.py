"""Cross-shard wavefront stitching: the multi-chip twin of models/wavefront.

The single-chip decoder runs intra reconstruction and the loop filter as
`lax.scan`s over offset-2 anti-diagonals of the MB grid (models/wavefront.py
— the TPU redesign of the reference's nsync-lagged row threads,
vp8/decoder/threading.c:252-478).  Here the SAME wavefront is executed
SPMD over a ('row',) device mesh: each shard owns Rs contiguous MB rows and
scans over GLOBAL diagonal steps; shard s is active on global diagonals
[2*s*Rs, 2*s*Rs + 2*(Rs-1) + C), so shard s+1 starts only 2*Rs steps after
shard s — the same 2-column wavefront lag the reference's decode threads
use (threading.c:313-317), now across chips.

The cross-shard halo is exactly the deferred-edit-strip payload of the
single-chip design:

  intra  — each step, the shard's newly reconstructed bottom-row MB ships
           its last pixel row (y[16], u[8], v[8]) one shard DOWN via
           `ppermute`; the receiver scatters it into an above-strip buffer
           that replaces the `up/ar/al` store reads for its local row 0.
  filter — each step ships the bottom-row MB's post-filter bottom 4 rows
           (the B store) plus the L strip its right neighbor wrote into it
           (composed on arrival); the receiving shard's row-0 MB-edge
           horizontal filter reads this 4-px halo, and the 4 rows it writes
           BACK into the upper shard (the U edit strip,
           loopfilter_filters.c mbfilter p-side) are accumulated and
           ppermuted UP once after the scan — U strips are never re-read
           by the producer row, only composed into its final pixels, so a
           single post-scan exchange preserves the serial write order.

Bit-exactness vs the single-device decode is asserted for every shard
count by tests/test_sharded_decode.py (MD5 oracle).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models import wavefront as wf
from ..models.wavefront import B_PRED_M, schedule, _j
from ..ops import predict as P


@functools.lru_cache(maxsize=16)
def _shard_schedule(Rs, C):
    """Local schedule + per-diagonal bookkeeping for strip traffic.

    Extends wavefront.schedule(Rs, C) with, for each local diagonal d:
      last_lane/last_col/last_ok — the (single) MB of the local LAST row on
        d (offset-2 diagonals hold at most one MB per row);
      row0_lane/row0_col/row0_ok — the (single) MB of local row 0 on d.
    """
    sch = dict(schedule(Rs, C))
    D = sch["D"]
    last_lane = np.zeros(D, np.int32)
    last_col = np.zeros(D, np.int32)
    last_ok = np.zeros(D, bool)
    row0_lane = np.zeros(D, np.int32)
    row0_col = np.zeros(D, np.int32)
    row0_ok = np.zeros(D, bool)
    for d in range(D):
        for m in range(sch["M"]):
            if not sch["valid"][d, m]:
                continue
            r, c = int(sch["r"][d, m]), int(sch["c"][d, m])
            if r == Rs - 1:
                last_lane[d], last_col[d], last_ok[d] = m, c, True
            if r == 0:
                row0_lane[d], row0_col[d], row0_ok[d] = m, c, True
    sch.update(last_lane=last_lane, last_col=last_col, last_ok=last_ok,
               row0_lane=row0_lane, row0_col=row0_col, row0_ok=row0_ok)
    return sch


def _perm_down(n):
    return [(i, i + 1) for i in range(n - 1)]


def _perm_up(n):
    return [(i, i - 1) for i in range(1, n)]


# ---------------------------------------------------------------------------
# intra reconstruction, sharded

def intra_recon_sharded(Rs, C, n_shards, axis_name,
                        inter_y, inter_u, inter_v,
                        resid_y_b, resid_u_b, resid_v_b,
                        mode, uv_mode, intra, bmodes):
    """Per-shard body (call inside shard_map): wavefront intra recon over
    this shard's Rs x C local MB grid, stitched to the shard above through
    per-step bottom-row pixel strips.  Same lane math as
    wavefront.intra_recon_blocks (reconintra.c / reconintra4x4.c duals).
    """
    sch = _shard_schedule(Rs, C)
    s = _j(sch)
    D, M = sch["D"], sch["M"]
    D_local = 2 * (Rs - 1) + C
    D_global = 2 * (n_shards * Rs - 1) + C
    sidx = jax.lax.axis_index(axis_name)
    has_above = sidx > 0
    d_off = 2 * sidx * Rs

    store_y0 = jnp.zeros((D, M, 16, 16), jnp.int32)
    store_u0 = jnp.zeros((D, M, 8, 8), jnp.int32)
    store_v0 = jnp.zeros((D, M, 8, 8), jnp.int32)
    strip_y0 = jnp.zeros((C, 16), jnp.int32)
    strip_u0 = jnp.zeros((C, 8), jnp.int32)
    strip_v0 = jnp.zeros((C, 8), jnp.int32)
    pay0 = jnp.zeros((2 + 16 + 8 + 8,), jnp.int32)

    def body(carry, dg):
        sy, su, sv, strip_y, strip_u, strip_v, pay_in = carry
        # merge the strip that arrived from the shard above (sent at the
        # end of the previous global step)
        pcol = jnp.where(pay_in[0] > 0, pay_in[1], C)
        strip_y = strip_y.at[pcol].set(pay_in[2:18], mode="drop")
        strip_u = strip_u.at[pcol].set(pay_in[18:26], mode="drop")
        strip_v = strip_v.at[pcol].set(pay_in[26:34], mode="drop")

        dl = dg - d_off
        active = (dl >= 0) & (dl < D_local)
        d = jnp.clip(dl, 0, D - 1)

        r = s["r"][d]
        c = s["c"][d]
        n = s["n"][d]

        def lane(m):
            rr, cc_, nn = r[m], c[m], n[m]
            up_ok = s["up_ok"][d][m]
            left_ok = s["left_ok"][d][m]
            row0a = (rr == 0) & has_above
            up_blk = sy[d - 2, s["up"][d][m]]
            left_blk = sy[d - 1, s["left"][d][m]]
            ar_blk = sy[d - 1, s["ar"][d][m]]
            al_blk = sy[d - 3, s["al"][d][m]]
            above = jnp.where(row0a, strip_y[cc_],
                              jnp.where(up_ok, up_blk[15, :], 127))
            leftc = jnp.where(left_ok, left_blk[:, 15], 129)
            tl0 = jnp.where(rr == 0, 127,
                            jnp.where(cc_ == 0, 129, al_blk[15, 15]))
            tl = jnp.where(row0a,
                           jnp.where(cc_ == 0, 129,
                                     strip_y[jnp.maximum(cc_ - 1, 0), 15]),
                           tl0)
            rep = jnp.full((4,), 1, jnp.int32) * above[15]
            ar_in = jnp.where(s["ar_ok"][d][m], ar_blk[15, :4], 127)
            arpx0 = jnp.where(rr == 0, jnp.full((4,), 127, jnp.int32),
                              jnp.where(cc_ == C - 1, rep, ar_in))
            arpx = jnp.where(row0a,
                             jnp.where(cc_ == C - 1, rep,
                                       strip_y[jnp.minimum(cc_ + 1, C - 1),
                                               :4]),
                             arpx0)
            rblk = resid_y_b[nn]
            pred16 = P.pred_nxn(mode[nn], above, leftc, tl,
                                (rr != 0) | row0a, cc_ != 0, 16)
            rec16 = jnp.clip(pred16 + rblk, 0, 255)
            yblk = jnp.where(intra[nn], rec16, inter_y[nn])

            def chroma(store_c, strip_c, inter_c, resid_c, bw):
                upb = store_c[d - 2, s["up"][d][m]]
                lb = store_c[d - 1, s["left"][d][m]]
                alb = store_c[d - 3, s["al"][d][m]]
                a = jnp.where(row0a, strip_c[cc_],
                              jnp.where(up_ok, upb[bw - 1, :], 127))
                l = jnp.where(left_ok, lb[:, bw - 1], 129)
                t0 = jnp.where(rr == 0, 127,
                               jnp.where(cc_ == 0, 129, alb[bw - 1, bw - 1]))
                t = jnp.where(row0a,
                              jnp.where(cc_ == 0, 129,
                                        strip_c[jnp.maximum(cc_ - 1, 0),
                                                bw - 1]),
                              t0)
                pd = P.pred_nxn(uv_mode[nn], a, l, t,
                                (rr != 0) | row0a, cc_ != 0, bw)
                blk = jnp.clip(pd + resid_c[nn], 0, 255)
                return jnp.where(intra[nn], blk, inter_c[nn])

            ublk = chroma(su, strip_u, inter_u, resid_u_b, 8)
            vblk = chroma(sv, strip_v, inter_v, resid_v_b, 8)
            return yblk, ublk, vblk, above, leftc, tl, arpx, rblk, nn

        yb, ub, vb, l_above, l_left, l_tl, l_arpx, l_rblk, l_nn = \
            jax.vmap(lane)(jnp.arange(M))

        def run_bpred(yb):
            def bl(yblk, above, leftc, tl, arpx, rblk, nn):
                ws = jnp.zeros((17, 21), jnp.int32)
                ws = ws.at[0, 0].set(tl)
                ws = ws.at[0, 1:17].set(above)
                ws = ws.at[0, 17:21].set(arpx)
                ws = ws.at[1:17, 0].set(leftc)
                ws = ws.at[4, 17:21].set(arpx)
                ws = ws.at[8, 17:21].set(arpx)
                ws = ws.at[12, 17:21].set(arpx)

                def bstep(k, ws):
                    ir = k >> 2
                    ic = k & 3
                    above8 = jax.lax.dynamic_slice(ws, (4 * ir, 1 + 4 * ic),
                                                   (1, 8))[0]
                    left4 = jax.lax.dynamic_slice(ws, (1 + 4 * ir, 4 * ic),
                                                  (4, 1))[:, 0]
                    tl4 = jax.lax.dynamic_slice(ws, (4 * ir, 4 * ic),
                                                (1, 1))[0, 0]
                    blk = P.bpred_4x4(bmodes[nn, k], above8, left4, tl4)
                    rsub = jax.lax.dynamic_slice(rblk, (4 * ir, 4 * ic),
                                                 (4, 4))
                    blk = jnp.clip(blk + rsub, 0, 255)
                    return jax.lax.dynamic_update_slice(
                        ws, blk, (1 + 4 * ir, 1 + 4 * ic))

                wsf = jax.lax.fori_loop(0, 16, bstep, ws)
                recB = wsf[1:17, 1:17]
                return jnp.where((mode[nn] == B_PRED_M) & intra[nn],
                                 recB, yblk)
            return jax.vmap(bl)(yb, l_above, l_left, l_tl, l_arpx, l_rblk,
                                l_nn)

        any_bpred = jnp.any((mode[n] == B_PRED_M) & intra[n] &
                            s["valid"][d]) & active
        yb = jax.lax.cond(any_bpred, run_bpred, lambda y: y, yb)

        # inactive steps must not clobber the stores
        yb = jnp.where(active, yb, sy[d])
        ub = jnp.where(active, ub, su[d])
        vb = jnp.where(active, vb, sv[d])
        sy = jax.lax.dynamic_update_slice(sy, yb[None], (d, 0, 0, 0))
        su = jax.lax.dynamic_update_slice(su, ub[None], (d, 0, 0, 0))
        sv = jax.lax.dynamic_update_slice(sv, vb[None], (d, 0, 0, 0))

        # ship this step's bottom-row pixels one shard down
        lv = s["last_ok"][d] & active
        mL = s["last_lane"][d]
        pay = jnp.concatenate([
            jnp.stack([lv.astype(jnp.int32), s["last_col"][d]]),
            yb[mL, 15, :], ub[mL, 7, :], vb[mL, 7, :]])
        pay_next = jax.lax.ppermute(pay, axis_name, _perm_down(n_shards)) \
            if n_shards > 1 else jnp.zeros_like(pay)
        return (sy, su, sv, strip_y, strip_u, strip_v, pay_next), None

    carry0 = (store_y0, store_u0, store_v0, strip_y0, strip_u0, strip_v0,
              pay0)
    (sy, su, sv, *_), _ = jax.lax.scan(body, carry0, jnp.arange(D_global))
    mb_d, mb_m = s["mb_d"], s["mb_m"]
    return sy[mb_d, mb_m], su[mb_d, mb_m], sv[mb_d, mb_m]


# ---------------------------------------------------------------------------
# loop filter, sharded

def loop_filter_sharded(Rs, C, n_shards, axis_name, simple,
                        y_blocks, u_blocks, v_blocks,
                        flevel, mblim_a, blim_a, lim_a, hev_a, noskip_a):
    """Per-shard wavefront loop filter stitched across the row seams.

    Halo DOWN per step: the bottom-row MB's filtered bottom 4 rows plus
    the L strip its right neighbor wrote into them (loopfilter.c raster
    write order).  Halo UP once after the scan: the U edit strips the
    below shard's row-0 MB-edge filters wrote into our bottom rows.
    """
    sch = _shard_schedule(Rs, C)
    s = _j(sch)
    D, M = sch["D"], sch["M"]
    D_local = 2 * (Rs - 1) + C
    D_global = 2 * (n_shards * Rs - 1) + C
    sidx = jax.lax.axis_index(axis_name)
    has_above = sidx > 0
    d_off = 2 * sidx * Rs

    stores = dict(
        By=jnp.zeros((D, M, 16, 16), jnp.int32),
        Ly=jnp.zeros((D, M, 16, 4), jnp.int32),
        Uy=jnp.zeros((D, M, 4, 16), jnp.int32),
        Bu=jnp.zeros((D, M, 8, 8), jnp.int32),
        Lu=jnp.zeros((D, M, 8, 4), jnp.int32),
        Uu=jnp.zeros((D, M, 4, 8), jnp.int32),
        Bv=jnp.zeros((D, M, 8, 8), jnp.int32),
        Lv=jnp.zeros((D, M, 8, 4), jnp.int32),
        Uv=jnp.zeros((D, M, 4, 8), jnp.int32),
    )
    names = list(stores.keys())
    strip_y0 = jnp.zeros((C, 4, 16), jnp.int32)
    strip_u0 = jnp.zeros((C, 4, 8), jnp.int32)
    strip_v0 = jnp.zeros((C, 4, 8), jnp.int32)
    useam_y0 = jnp.zeros((C, 4, 16), jnp.int32)
    useam_u0 = jnp.zeros((C, 4, 8), jnp.int32)
    useam_v0 = jnp.zeros((C, 4, 8), jnp.int32)
    PAY = 4 + 64 + 32 + 32 + 16 + 16 + 16
    pay0 = jnp.zeros((PAY,), jnp.int32)

    def body(carry, dg):
        st_t, strip_y, strip_u, strip_v, us_y, us_u, us_v, pay_in = carry
        st = dict(zip(names, st_t))
        # merge arriving halo: B bottom rows, then the L strip overlay the
        # right neighbor wrote into them (chronological raster order)
        bcol = jnp.where(pay_in[0] > 0, pay_in[1], C)
        strip_y = strip_y.at[bcol].set(pay_in[4:68].reshape(4, 16),
                                       mode="drop")
        strip_u = strip_u.at[bcol].set(pay_in[68:100].reshape(4, 8),
                                       mode="drop")
        strip_v = strip_v.at[bcol].set(pay_in[100:132].reshape(4, 8),
                                       mode="drop")
        lcol = jnp.where(pay_in[2] > 0, pay_in[3], C)
        strip_y = strip_y.at[lcol, :, 12:16].set(
            pay_in[132:148].reshape(4, 4), mode="drop")
        strip_u = strip_u.at[lcol, :, 4:8].set(
            pay_in[148:164].reshape(4, 4), mode="drop")
        strip_v = strip_v.at[lcol, :, 4:8].set(
            pay_in[164:180].reshape(4, 4), mode="drop")

        dl = dg - d_off
        active_d = (dl >= 0) & (dl < D_local)
        d = jnp.clip(dl, 0, D - 1)

        r = s["r"][d]
        c = s["c"][d]
        n = s["n"][d]
        valid = s["valid"][d]
        left_ok = s["left_ok"][d]
        up_ok = s["up_ok"][d]
        ar_ok = s["ar_ok"][d]
        row0a = (r == 0) & has_above
        up_eff = up_ok | row0a
        fl = flevel[n]
        active = valid & (fl > 0) & active_d
        ml, bl, il, hv = mblim_a[n], blim_a[n], lim_a[n], hev_a[n]
        noskip = noskip_a[n]

        def build_patch(B, L, strip_c, blocks, bw):
            def lane(m):
                own = blocks[n[m]]
                lblk = B[d - 1, s["left"][d][m]]
                ublk = B[d - 2, s["up"][d][m]]
                arL = L[d - 1, s["ar"][d][m]]
                ub = jnp.where(ar_ok[m],
                               ublk.at[:, bw - 4:].set(arL), ublk)
                ub_rows = jnp.where(row0a[m], strip_c[c[m]],
                                    jnp.where(up_ok[m], ub[bw - 4:, :], 0))
                p = jnp.zeros((bw + 4, bw + 4), jnp.int32)
                p = p.at[4:, 4:].set(own)
                p = p.at[4:, 0:4].set(jnp.where(left_ok[m],
                                                lblk[:, bw - 4:], 0))
                p = p.at[0:4, 4:].set(ub_rows)
                return p
            return jax.vmap(lane)(jnp.arange(M))

        py = build_patch(st["By"], st["Ly"], strip_y, y_blocks, 16)
        py = wf._edge_v(py, 4, True, active & left_ok, ml, il, hv, simple)
        for col in (8, 12, 16):
            py = wf._edge_v(py, col, False, active & noskip, bl, il, hv,
                            simple)
        py = wf._edge_h(py, 4, True, active & up_eff, ml, il, hv, simple)
        for row in (8, 12, 16):
            py = wf._edge_h(py, row, False, active & noskip, bl, il, hv,
                            simple)

        newst = {}
        newst["By"] = py[:, 4:, 4:]
        newst["Ly"] = py[:, 4:, 0:4]
        newst["Uy"] = py[:, 0:4, 4:]

        if not simple:
            for bname, lname, uname, strip_c, blocks in (
                    ("Bu", "Lu", "Uu", strip_u, u_blocks),
                    ("Bv", "Lv", "Uv", strip_v, v_blocks)):
                pc = build_patch(st[bname], st[lname], strip_c, blocks, 8)
                pc = wf._edge_v8(pc, 4, True, active & left_ok, ml, il, hv)
                pc = wf._edge_v8(pc, 8, False, active & noskip, bl, il, hv)
                pc = wf._edge_h8(pc, 4, True, active & up_eff, ml, il, hv)
                pc = wf._edge_h8(pc, 8, False, active & noskip, bl, il, hv)
                newst[bname] = pc[:, 4:, 4:]
                newst[lname] = pc[:, 4:, 0:4]
                newst[uname] = pc[:, 0:4, 4:]
        else:
            def pass_blocks(blocks):
                return jax.vmap(lambda m: blocks[n[m]])(jnp.arange(M))
            newst["Bu"] = pass_blocks(u_blocks)
            newst["Bv"] = pass_blocks(v_blocks)
            newst["Lu"] = st["Lu"][d]
            newst["Lv"] = st["Lv"][d]
            newst["Uu"] = st["Uu"][d]
            newst["Uv"] = st["Uv"][d]

        for k in names:
            val = jnp.where(active_d, newst[k], st[k][d])
            st[k] = jax.lax.dynamic_update_slice(
                st[k], val[None], (d,) + (0,) * (st[k].ndim - 1))

        # accumulate the U edit strips our row-0 MBs wrote into the shard
        # above (applied there after the scan; never re-read here)
        r0v = s["row0_ok"][d] & active_d & has_above
        m0 = s["row0_lane"][d]
        c0 = jnp.where(r0v, s["row0_col"][d], C)
        us_y = us_y.at[c0].set(py[m0, 0:4, 4:], mode="drop")
        if not simple:
            us_u = us_u.at[c0].set(st["Uu"][d][m0], mode="drop")
            us_v = us_v.at[c0].set(st["Uv"][d][m0], mode="drop")

        # ship the bottom-row halo one shard down: B bottom 4 rows of the
        # MB completed at this step, plus (next step, via Lcol=c-1) the L
        # strip its right neighbor just wrote into it
        lvv = s["last_ok"][d] & active_d
        mL = s["last_lane"][d]
        cL = s["last_col"][d]
        byb = st["By"][d][mL][12:16, :]
        bub = st["Bu"][d][mL][4:8, :]
        bvb = st["Bv"][d][mL][4:8, :]
        lyb = st["Ly"][d][mL][12:16, :]
        lub = st["Lu"][d][mL][4:8, :]
        lvb = st["Lv"][d][mL][4:8, :]
        pay = jnp.concatenate([
            jnp.stack([lvv.astype(jnp.int32), cL,
                       (lvv & (cL > 0)).astype(jnp.int32), cL - 1]),
            byb.reshape(-1), bub.reshape(-1), bvb.reshape(-1),
            lyb.reshape(-1), lub.reshape(-1), lvb.reshape(-1)])
        pay_next = jax.lax.ppermute(pay, axis_name, _perm_down(n_shards)) \
            if n_shards > 1 else jnp.zeros_like(pay)
        return (tuple(st[k] for k in names), strip_y, strip_u, strip_v,
                us_y, us_u, us_v, pay_next), None

    carry0 = (tuple(stores[k] for k in names), strip_y0, strip_u0, strip_v0,
              useam_y0, useam_u0, useam_v0, pay0)
    (st_t, _, _, _, us_y, us_u, us_v, _), _ = jax.lax.scan(
        body, carry0, jnp.arange(D_global))
    st = dict(zip(names, st_t))

    # local compose: own B + L strip from right neighbor + U strip from the
    # below MB (within-shard rows only — the seam row gets its U strips
    # from the shard below next)
    mb_d, mb_m = s["mb_d"], s["mb_m"]
    N = Rs * C
    nidx = np.arange(N)
    has_right = (nidx % C) < (C - 1)
    has_down = (nidx // C) < (Rs - 1)
    right_n = np.where(has_right, nidx + 1, nidx)
    down_n = np.where(has_down, nidx + C, nidx)
    jd = {k: jnp.asarray(v) for k, v in dict(
        has_right=has_right, has_down=has_down,
        rd=sch["mb_d"][right_n], rm=sch["mb_m"][right_n],
        dd=sch["mb_d"][down_n], dm=sch["mb_m"][down_n]).items()}

    def compose(Bst, Lst, Ust, bw):
        own = Bst[mb_d, mb_m]
        lstrip = Lst[jd["rd"], jd["rm"]]
        own = jnp.where(jd["has_right"][:, None, None],
                        own.at[:, :, bw - 4:].set(lstrip), own)
        ustrip = Ust[jd["dd"], jd["dm"]]
        own = jnp.where(jd["has_down"][:, None, None],
                        own.at[:, bw - 4:, :].set(ustrip), own)
        return own

    y_out = compose(st["By"], st["Ly"], st["Uy"], 16)
    if simple:
        u_out = st["Bu"][mb_d, mb_m]
        v_out = st["Bv"][mb_d, mb_m]
    else:
        u_out = compose(st["Bu"], st["Lu"], st["Uu"], 8)
        v_out = compose(st["Bv"], st["Lv"], st["Uv"], 8)

    # seam U strips: ship the accumulated row-0 edits UP and overlay them on
    # our last local row (the cross-shard half of the compose above)
    if n_shards > 1:
        seam_y = jax.lax.ppermute(us_y, axis_name, _perm_up(n_shards))
        seam_u = jax.lax.ppermute(us_u, axis_name, _perm_up(n_shards))
        seam_v = jax.lax.ppermute(us_v, axis_name, _perm_up(n_shards))
        has_below = sidx < n_shards - 1
        idx_last = jnp.arange((Rs - 1) * C, Rs * C)
        y_bot = jnp.where(has_below, seam_y, y_out[idx_last, 12:16, :])
        y_out = y_out.at[idx_last, 12:16, :].set(y_bot)
        if not simple:
            u_bot = jnp.where(has_below, seam_u, u_out[idx_last, 4:8, :])
            v_bot = jnp.where(has_below, seam_v, v_out[idx_last, 4:8, :])
            u_out = u_out.at[idx_last, 4:8, :].set(u_bot)
            v_out = v_out.at[idx_last, 4:8, :].set(v_bot)
    return y_out, u_out, v_out
