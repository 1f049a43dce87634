"""Full-registry scale-regression sweep: every query at 1x and 10x data.

Runs each registered query warm (min of 2) against sf0.1 and a 10x
inflated copy, printing one JSON line per query and writing the full
map at the end.  Flags to investigate: ratio x10/x1 near or above 10
(superlinear unless the query's OUTPUT grows superlinearly under the
inflation — per-key pair producers do; see SCALING.md "Full-registry
10x sweep" for the interpretation rules).

Build the inflated copy first (orders/lineitem/events unioned 10x with
key offsets, dimensions symlinked) — see SCALING.md.  Usage:

    python scripts/scale_sweep.py [x1_dir] [x10_dir] [out.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cooler_mapreduce_spark.session import get_session
from cooler_mapreduce_spark import registry

x1 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
x10 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_inflated"
out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale_sweep.json"

#: x10 is SKIPPED for the two allowlisted all-pairs AUDIT tiers: their
#: OUTPUT is quadratic in per-key duplicate density BY DESIGN (oracle
#: ground truth at test scale — each docstring says to use the bucketed
#: path at 100 TB), and the inflation method multiplies that density
#: 10x, so their x10 run measures ~100x the pair OUTPUT, not the plan
#: (the r6 interpretation rule; at r8 the LSH twin's x10 additionally
#: exhausted the sweep JVM and killed every query after it).
X10_SKIP = {"embedding_cosine_dups", "embedding_cosine_dups_lsh"}

#: CONTENTION GATE (round-10 verdict What's-wrong #2: the r10 debut
#: readings were published with a contention caveat because the sweep
#: ran concurrently with another suite). Each label's timing window is
#: checked for same-host foreign CPU and hypervisor steal (bench.py's
#: thresholds); a contended reading is RE-RUN up to twice, and a
#: reading that never gets a quiet window is marked, not silently
#: published.
def _cpu_snapshot():
    try:
        with open("/proc/stat") as fh:
            vals = [int(x) for x in fh.readline().split()[1:]]
        total = sum(vals)
        busy = total - vals[3] - (vals[4] if len(vals) > 4 else 0)
        steal = vals[7] if len(vals) > 7 else 0
        procs = {}
        for d in os.listdir("/proc"):
            if not d.isdigit():
                continue
            try:
                with open(f"/proc/{d}/stat") as fh:
                    st = fh.read()
                rest = st[st.rindex(")") + 2:].split()
                procs[int(d)] = (int(rest[1]), int(rest[11]) + int(rest[12]))
            except (OSError, ValueError, IndexError):
                continue
        kids = {}
        for pid, (ppid, _) in procs.items():
            kids.setdefault(ppid, []).append(pid)
        tree, stack, seen = 0, [os.getpid()], set()
        while stack:
            p = stack.pop()
            if p in seen:
                continue
            seen.add(p)
            tree += procs.get(p, (0, 0))[1]
            stack.extend(kids.get(p, []))
        return busy, tree, total, steal
    except OSError:
        return None


def _window_frac(before, after):
    if before is None or after is None:
        return None, None
    d_busy, d_tree = after[0] - before[0], after[1] - before[1]
    d_total, d_steal = after[2] - before[2], after[3] - before[3]
    if d_total <= 0:
        return None, None
    return (
        round(max(0.0, (d_busy - d_steal - d_tree)) / d_total, 4),
        round(d_steal / d_total, 4),
    )


spark = get_session()
res = {}
for name, spec in registry.load_all().items():
    row = {}
    for sfd, label in ((x1, "x1"), (x10, "x10")):
        if label == "x10" and name in X10_SKIP:
            row[label] = "SKIP:pair-output-blowup-by-design"
            continue
        try:
            # publish the first QUIET attempt's reading; if no attempt
            # gets a quiet window, publish the MIN over attempts (a
            # slower later attempt must not displace a faster earlier
            # one) and flag the reading as contended
            attempts: list[tuple[float, object, object]] = []
            quiet = False
            for attempt in range(3):
                snap0 = _cpu_snapshot()
                t0 = time.time()
                spec.fn(spark, sfd).count()
                warm = time.time() - t0
                t0 = time.time()
                spec.fn(spark, sfd).count()
                best = round(min(warm, time.time() - t0), 2)
                f, s = _window_frac(snap0, _cpu_snapshot())
                attempts.append((best, f, s))
                quiet = f is None or (f <= 0.05 and (s is None or s <= 0.05))
                if quiet:
                    break
            if quiet:
                row[label] = attempts[-1][0]
            else:
                best, f, s = min(attempts, key=lambda a: a[0])
                row[label] = best
                row[f"{label}_contended"] = {"foreign": f, "steal": s}
        except Exception as ex:  # keep sweeping; one bad query isn't the story
            row[label] = f"ERR:{type(ex).__name__}"
            break
    res[name] = row
    print(json.dumps({name: row}), flush=True)
    # a long-lived sweep JVM accumulates localCheckpoint blocks across
    # hundreds of queries; dropping the Python refs and clearing the
    # cache between queries keeps the block manager bounded
    import gc
    gc.collect()
    try:
        spark.catalog.clearCache()
    except Exception:
        pass
with open(out, "w") as fh:
    json.dump(res, fh, indent=1)
spark.stop()
