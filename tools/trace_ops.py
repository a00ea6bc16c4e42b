#!/usr/bin/env python
"""Capture a jax.profiler trace of a train/infer step and print the top HLO
ops by device self-time.

This is the op-level complement to the ablation ladders (profile_weak.py,
profile_bwd.py): one run attributes the WHOLE compiled step — forward,
backward, optimizer — to individual fusions, with no re-jitting. Parity
context: the reference's profiling story is hand-timed phase logs
(omni3d_evaluation.py:548-631); on TPU the native equivalent is an xplane
trace, which this tool reduces to a flat JSON table.

Usage:
  python tools/trace_ops.py [--weak] [--mode train|infer] [--top 40]
      [--out output/trace_ops]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def _pb_fields(buf: memoryview):
    """Yield (field_no, wire_type, value) from a protobuf message body.

    Minimal wire-format reader: varint (0), 64-bit (1), length-delimited (2),
    32-bit (5). Enough to walk an XSpace without any generated proto code
    (the image's tensorboard_plugin_profile / TF pywrap are version-skewed
    and cannot load one).
    """
    i, n = 0, len(buf)
    while i < n:
        tag = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            tag |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        field, wt = tag >> 3, tag & 7
        if wt == 0:
            v = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                v |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield field, wt, v
        elif wt == 2:
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield field, wt, buf[i : i + ln]
            i += ln
        elif wt == 1:
            yield field, wt, bytes(buf[i : i + 8])
            i += 8
        elif wt == 5:
            yield field, wt, bytes(buf[i : i + 4])
            i += 4
        else:  # pragma: no cover - groups unused in xplane
            raise ValueError(f"unsupported wire type {wt}")


def summarize_xspace_raw(trace_dir: str, top: int):
    """Plugin-free xplane reducer: aggregate device-plane event durations.

    XSpace schema (tsl/profiler/protobuf/xplane.proto): XSpace.planes=1;
    XPlane{name=2, lines=3, event_metadata=4(map)}; XLine{name=2, events=4};
    XEvent{metadata_id=1, duration_ps=3}; XEventMetadata{id=1, name=2}.
    On TPU device planes each line's op events are non-overlapping, so
    duration == self time at the line's granularity; we use the 'XLA Ops'
    line (falling back to all lines of the TPU plane).
    """
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    buf = memoryview(open(paths[-1], "rb").read())
    per_line = {}  # (plane, line) -> {name: total_ps}
    for f, wt, plane in _pb_fields(buf):
        if f != 1 or wt != 2:
            continue
        name, lines, meta = "", [], {}
        for pf, pwt, pv in _pb_fields(plane):
            if pf == 2 and pwt == 2:
                name = bytes(pv).decode("utf-8", "replace")
            elif pf == 3 and pwt == 2:
                lines.append(pv)
            elif pf == 4 and pwt == 2:
                k, mname = None, ""
                for mf, mwt, mv in _pb_fields(pv):
                    if mf == 1 and mwt == 0:
                        k = mv
                    elif mf == 2 and mwt == 2:
                        for ef, ewt, ev in _pb_fields(mv):
                            if ef == 1 and ewt == 0 and k is None:
                                k = ev
                            elif ef == 2 and ewt == 2:
                                mname = bytes(ev).decode("utf-8", "replace")
                if k is not None:
                    meta[k] = mname
        low = name.lower()
        if not ("tpu" in low or "/device" in low) or "host" in low:
            continue
        for ln in lines:
            lname, events = "", []
            for lf, lwt, lv in _pb_fields(ln):
                if lf == 2 and lwt == 2:
                    lname = bytes(lv).decode("utf-8", "replace")
                elif lf == 4 and lwt == 2:
                    events.append(lv)
            agg = per_line.setdefault((name, lname), {})
            for e in events:
                mid, dur = 0, 0
                for ef, ewt, ev in _pb_fields(e):
                    if ef == 1 and ewt == 0:
                        mid = ev
                    elif ef == 3 and ewt == 0:
                        dur = ev
                nm = meta.get(mid, str(mid))
                agg[nm] = agg.get(nm, 0) + dur
    if not per_line:
        raise RuntimeError("no device-plane events found in trace")
    for (pl, ln), agg in sorted(per_line.items()):
        print(json.dumps({"plane": pl, "line": ln, "events": len(agg),
                          "total_us": round(sum(agg.values()) / 1e6, 1)}))
    # the op-level line: prefer an 'XLA Ops' line, else the busiest line
    key = next((k for k in per_line if "xla op" in k[1].lower()), None)
    if key is None:
        key = max(per_line, key=lambda k: sum(per_line[k].values()))
    agg = per_line[key]
    total = sum(agg.values())
    print(json.dumps({"chosen_line": key[1], "total_device_us": round(total / 1e6, 1)}))
    for nm, ps in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(json.dumps({"name": nm[:110], "self_us": round(ps / 1e6, 1),
                          "pct": round(100 * ps / total, 2)}))


def summarize_xspace(trace_dir: str, top: int):
    """Reduce the newest .xplane.pb under trace_dir to an op-stats table."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], "framework_op_stats^", {"tqx": "out:csv"}
    )
    if isinstance(data, bytes):
        data = data.decode()
    import csv
    import io

    rows = list(csv.DictReader(io.StringIO(data)))
    # device-side ops only, ranked by total self time
    dev = [r for r in rows if r.get("Host/device", r.get("device_or_host", "")).lower().startswith("dev")]
    if not dev:
        dev = rows
    def f(r, k):
        try:
            return float(r.get(k, 0) or 0)
        except ValueError:
            return 0.0

    key_self = None
    for cand in ("Total self-time (us)", "total_self_time_us", "Total self time (us)", "Total self-time (μs)"):
        if dev and cand in dev[0]:
            key_self = cand
            break
    if key_self is None:
        # dump available columns for debugging
        print(json.dumps({"columns": list(dev[0].keys()) if dev else []}))
        return
    dev.sort(key=lambda r: -f(r, key_self))
    total = sum(f(r, key_self) for r in dev)
    out = []
    for r in dev[:top]:
        name_key = "Operation" if "Operation" in r else ("Op name" if "Op name" in r else list(r.keys())[0])
        out.append(
            {
                "op": r.get("Type", r.get("Category", ""))[:24],
                "name": r[name_key][:110],
                "self_us": round(f(r, key_self), 1),
                "pct": round(100 * f(r, key_self) / max(total, 1e-9), 2),
            }
        )
    print(json.dumps({"total_device_us": round(total, 1)}))
    for row in out:
        print(json.dumps(row))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weak", action="store_true")
    ap.add_argument("--mode", choices=["train", "infer"], default="train")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--out", default="output/trace_ops")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--analyze-only", default="", help="existing trace dir")
    args = ap.parse_args()

    if args.analyze_only:
        summarize_xspace_raw(args.analyze_only, args.top)
        return

    from bench_all import BATCH, _train_batch, det_cfg, make_image_batch

    from threedod.models import build_model
    from threedod.train import Trainer

    cfg = det_cfg("dla34")
    if args.weak:
        cfg.model.meta_architecture = "RCNN3DCombined"
    cfg.solver.ims_per_batch = BATCH
    rng = np.random.RandomState(3)

    if args.mode == "train":
        batch = _train_batch(cfg, rng, args.weak)
        model = build_model(cfg)
        trainer = Trainer(cfg, model)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        step = trainer.make_train_step()
        holder = {"state": state}

        def one(i):
            new_state, _out = step(holder["state"], batch, jax.random.PRNGKey(i))
            total = _out.total
            holder["state"] = new_state
            return total
    else:
        batch = make_image_batch(rng, BATCH)
        model = build_model(cfg)
        variables = jax.jit(
            lambda b: model.init(
                {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
                b, train=False,
            )
        )(batch)
        infer = jax.jit(lambda v, b: model.apply(v, b, train=False))

        def one(i):
            return infer(variables, batch).scores.sum()

    # compile + settle outside the trace
    jax.device_get(one(0) * 0 + one(1) * 0)
    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        s = jnp.zeros((), jnp.float32)
        for i in range(args.steps):
            s = s + one(2 + i).astype(jnp.float32)
        jax.device_get(s)
    summarize_xspace_raw(args.out, args.top)


if __name__ == "__main__":
    main()
