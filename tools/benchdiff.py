#!/usr/bin/env python3
"""Round-over-round bench triage.

Usage: python3 tools/benchdiff.py <old> <new> [ratio_threshold]

Each arg is either a driver BENCH_r{N}.json ({"tail": ...}) or a raw
Bench stdout/log containing the full JSON line. Per-query numbers are
recovered from whatever survives truncation; queries visible in only
one side are listed separately so a truncated tail can't masquerade as
a regression or an improvement. Movers are ranked by ratio new/old;
-1 markers (failed queries) are reported, never ratio'd.

Caveat: the first surviving occurrence of each query name wins. A
left-truncated tail may have lost a query's min-based entry while its
median-based entry ("queries_median") survived, so cross-check any
surprising mover against the full bench log before chasing it.
"""
import json
import re
import sys


def load(path):
    text = open(path).read()
    streaming = {}
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and "tail" in doc:
            text = doc["tail"]
            if doc.get("parsed"):
                p = doc["parsed"]
                if p.get("queries"):
                    return ({k: float(v) for k, v in p["queries"].items()},
                            p.get("calib"), p.get("calib_io"),
                            p.get("streaming_rows_per_sec") or {})
    except json.JSONDecodeError:
        pass
    # streaming families live in their own objects; split them out
    # FIRST so rows/s values never pollute the per-query seconds map.
    # The round-over-round comparable is the min-of-interleaved map
    # ("streaming_rows_per_sec"); the _median sibling (round 11+) is
    # stripped here and ignored — read it in the raw tail when
    # adjudicating a flagged family.
    m = re.search(r'"streaming_rows_per_sec":\{([^}]*)\}', text)
    if m:
        streaming = {k: float(v) for k, v in
                     re.findall(r'"([a-z0-9_]+)":(-?[0-9.]+)', m.group(1))}
        text = text[:m.start()] + text[m.end():]
    m = re.search(r'"streaming_rows_per_sec_median":\{([^}]*)\}', text)
    if m:
        text = text[:m.start()] + text[m.end():]
    pairs = re.findall(r'"([a-z0-9_]+)":(-?[0-9.]+)', text)
    out = {}
    for k, v in pairs:
        out.setdefault(k, float(v))  # first occurrence = min-based "queries" map
    calib = out.pop("calib", None)
    calib_io = out.pop("calib_io", None)
    for meta in ("value", "n", "stream_passes"):
        out.pop(meta, None)
    return out, calib, calib_io, streaming


def streaming_section(s_old, s_new, calib_old, calib_new, io_old, io_new, thr):
    """Calib-normalized streaming triage under BOTH container lenses
    (round 15 — the batch movers' contract, applied to rows/s): rows/s
    scales inversely with container speed, so adjusted throughput =
    rows_per_sec x calib (calib = seconds for the fixed calibration job
    — bigger means a slower container; same for calib_io, the
    IO/bandwidth-shaped probe). A family is machine-adjudicated
    REGRESSION/IMPROVEMENT only if it clears the threshold under EVERY
    available lens — a family whose drift follows either probe moved
    with the container, not the code."""
    both = sorted(k for k in s_old.keys() & s_new.keys()
                  if s_old[k] > 0 and s_new[k] > 0)
    # a family whose run FAILED (or emitted 0 rows/s) must be named,
    # not silently dropped — a broken streaming leg may not read as
    # "all within drift band"
    skipped = sorted(k for k in s_old.keys() & s_new.keys()
                     if s_old[k] <= 0 or s_new[k] <= 0)
    if not both and not skipped:
        return
    print("streaming families (rows/s):")
    if skipped:
        print(f"  SKIPPED (non-positive rows/s on a side): {skipped}")
    if not both:
        return
    lenses = []
    if calib_old and calib_new:
        lenses.append(("cpu", calib_old, calib_new))
    if io_old and io_new:
        lenses.append(("io", io_old, io_new))
    if not lenses:
        print("  (no calib on one side — raw ratios only)")
    if len(lenses) == 1:
        print(f"  (single lens: {lenses[0][0]} — pre-r14 record on one side)")
    verdicts = []
    for k in both:
        a, b = s_old[k], s_new[k]
        raw = b / a
        line = f"  {k:20s} old={a:8.0f} new={b:8.0f} raw_ratio={raw:.2f}"
        adjs = [(tag, (b * cn) / (a * co)) for tag, co, cn in lenses]
        for tag, adj in adjs:
            line += f" {tag}_adj={adj:.2f}"
        if adjs:
            if all(adj < 1 / thr for _, adj in adjs):
                verdict = "REGRESSION"
            elif all(adj > thr for _, adj in adjs):
                verdict = "IMPROVEMENT"
            elif any(adj < 1 / thr or adj > thr for _, adj in adjs):
                verdict = "container-shaped"
            else:
                verdict = "drift-ok"
            line += f" -> {verdict}"
            verdicts.append((k, verdict))
        print(line)
    only_old = sorted(s_old.keys() - s_new.keys())
    only_new = sorted(s_new.keys() - s_old.keys())
    if only_old:
        print(f"  old-only: {only_old}")
    if only_new:
        print(f"  new-only: {only_new}")
    flagged = [k for k, v in verdicts if v in ("REGRESSION", "IMPROVEMENT")]
    if lenses:
        print(f"  streaming verdict: "
              + (f"flagged {flagged}" if flagged else "all within drift band"))


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, calib_old, io_old, s_old = load(sys.argv[1])
    new, calib_new, io_new, s_new = load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    failed_old = sorted(k for k, v in old.items() if v < 0)
    failed_new = sorted(k for k, v in new.items() if v < 0)
    both = {k: (old[k], new[k]) for k in old.keys() & new.keys()
            if old[k] > 0 and new[k] > 0}
    if calib_old and calib_new:
        print(f"calib: old={calib_old:.3f} new={calib_new:.3f} "
              f"(container health ratio {calib_new / calib_old:.2f})")
    if io_old and io_new:
        print(f"calib_io: old={io_old:.3f} new={io_new:.3f} "
              f"(IO/bandwidth health ratio {io_new / io_old:.2f})")
    print(f"comparable queries: {len(both)} "
          f"(old-only: {len(old.keys() - new.keys())}, new-only: {len(new.keys() - old.keys())})")
    tot_o = sum(a for a, _ in both.values())
    tot_n = sum(b for _, b in both.values())
    if tot_o:
        print(f"same-set totals: old={tot_o:.1f}s new={tot_n:.1f}s ratio={tot_n / tot_o:.2f}")
    if failed_new:
        print(f"FAILED in new: {failed_new}")
    if failed_old:
        print(f"(failed in old: {failed_old})")
    # Two drift lenses: the CPU probe (calib) and the IO/bandwidth probe
    # (calib_io, round 14+) bracket the container's two contention
    # modes. A mover is CODE-SUSPECT only if it stays beyond the
    # threshold under BOTH normalizations — a query whose drift follows
    # either probe moved with the container, not the code.
    movers = sorted(((k, a, b, b / a) for k, (a, b) in both.items()
                     if b / a >= thr or a / b >= thr), key=lambda t: -t[3])
    suspects = []
    if movers:
        print(f"movers (>= {thr}x either way):")
        for k, a, b, r in movers:
            line = f"  {k:30s} old={a:7.3f} new={b:7.3f} ratio={r:.2f}"
            adjs = []
            if calib_old and calib_new:
                adjs.append(("cpu", r * calib_old / calib_new))
            if io_old and io_new:
                adjs.append(("io", r * io_old / io_new))
            for tag, adj in adjs:
                line += f" {tag}_adj={adj:.2f}"
            if adjs and all(adj >= thr or adj <= 1 / thr for _, adj in adjs):
                line += " -> CODE-SUSPECT"
                suspects.append(k)
            elif adjs:
                line += " -> container-shaped"
            print(line)
        if calib_old and calib_new:
            print("batch verdict: "
                  + (f"code-suspect {suspects}" if suspects
                     else "all movers follow a container probe"))
    else:
        print(f"no movers >= {thr}x in either direction")
    streaming_section(s_old, s_new, calib_old, calib_new, io_old, io_new, thr)


if __name__ == "__main__":
    main()
