import collections, glob, gzip, json, os, re, sys

logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax-trace-train"
paths = sorted(glob.glob(os.path.join(logdir, "plugins/profile/*/perfetto_trace.json.gz")))
with gzip.open(paths[-1]) as f:
    data = json.load(f)
events = data if isinstance(data, list) else data.get("traceEvents", [])
pid_names = {e["pid"]: e["args"].get("name", "") for e in events
             if e.get("ph") == "M" and e.get("name") == "process_name"}
cat_tot = collections.Counter()
name_tot = collections.Counter()
total = 0.0
for e in events:
    if e.get("ph") != "X":
        continue
    pname = pid_names.get(e.get("pid"), "")
    if "TPU" not in pname and "/device:" not in pname:
        continue
    name = e.get("name", "")
    if name.startswith(("jit_", "while")) or name in ("run", ""):
        continue
    dur = e.get("dur", 0) / 1000.0
    total += dur
    base = re.sub(r"[.\d]+$", "", name)
    cat_tot[base] += dur
    name_tot[name] += dur
print(f"total device op time: {total:.1f} ms")
for k, v in cat_tot.most_common(30):
    print(f"{v:9.1f} ms  {100*v/total:5.1f}%  {k}")
