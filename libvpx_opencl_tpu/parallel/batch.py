"""Checkpointable batch transcode driver (pod-scale job layer).

The scale-out production story of BASELINE.json config 5: a corpus of
streams is partitioned across GOP-parallel workers ('gop' mesh axis /
multi-host DCN in a pod; process-parallel on one host) and each worker
transcodes its shard with periodic checkpoints so a preempted job resumes
where it stopped (the aux "checkpoint/resume" subsystem of SURVEY.md §5 —
the codec-level analogs are the two-pass stats file and the
get/set-reference snapshots, both also supported by this framework).
"""
from __future__ import annotations

import json
import os
import time


class BatchTranscoder:
    def __init__(self, jobs, out_dir, checkpoint_path=None, qindex=32,
                 use_tpu=False, shard_index=0, shard_count=1):
        """jobs: list of input IVF paths. Shard selection picks every
        shard_count-th job (the per-worker partition of the corpus)."""
        self.jobs = [j for i, j in enumerate(jobs)
                     if i % shard_count == shard_index]
        self.out_dir = out_dir
        self.ckpt = checkpoint_path or os.path.join(out_dir,
                                                    "transcode.ckpt.json")
        self.qindex = qindex
        self.use_tpu = use_tpu
        self.state = {"done": [], "stats": {}}
        if os.path.exists(self.ckpt):
            with open(self.ckpt) as f:
                self.state = json.load(f)

    def _save(self):
        os.makedirs(self.out_dir, exist_ok=True)
        tmp = self.ckpt + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.state, f)
        os.replace(tmp, self.ckpt)

    def run(self):
        from ..utils.ivf import IvfStream, read_ivf, write_ivf
        os.makedirs(self.out_dir, exist_ok=True)
        for job in self.jobs:
            name = os.path.basename(job)
            if name in self.state["done"]:
                continue
            t0 = time.time()
            if self.use_tpu:
                from ..models.tpu_decoder import TPUDecoder as Dec
                from ..models.tpu_encoder import TPUEncoder as Enc
            else:
                from ..models.refdec import RefDecoder
                from ..models.encoder import Encoder as Enc
                Dec = type("D", (RefDecoder,), {"use_native": True})
            dec = Dec()
            src = read_ivf(job)
            enc = Enc(src.width, src.height, qindex=self.qindex)
            out = IvfStream(width=src.width, height=src.height)
            n = 0
            for payload, pts in src.frames:
                show = dec.decode_frame_core(payload)
                if not show:
                    continue
                y, u, v = dec.frame_to_show.visible()
                out.frames.append((enc.encode_frame(y, u, v), pts))
                n += 1
            out_path = os.path.join(self.out_dir, name)
            write_ivf(out_path, out)
            self.state["done"].append(name)
            self.state["stats"][name] = {
                "frames": n,
                "seconds": round(time.time() - t0, 2),
                "out_bytes": os.path.getsize(out_path),
            }
            self._save()
        return self.state
