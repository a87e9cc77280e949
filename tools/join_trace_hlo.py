import collections, glob, gzip, json, re

# trace durations
paths = sorted(glob.glob("/tmp/jax-trace-train/plugins/profile/*/perfetto_trace.json.gz"))
with gzip.open(paths[-1]) as f:
    data = json.load(f)
events = data if isinstance(data, list) else data.get("traceEvents", [])
pid_names = {e["pid"]: e["args"].get("name", "") for e in events
             if e.get("ph") == "M" and e.get("name") == "process_name"}
tid_names = {(e["pid"], e["tid"]): e["args"].get("name", "") for e in events
             if e.get("ph") == "M" and e.get("name") == "thread_name"}
dur = collections.Counter()
for e in events:
    if e.get("ph") != "X": continue
    if tid_names.get((e.get("pid"), e.get("tid"))) != "XLA Ops": continue
    dur[e["name"]] += e.get("dur", 0) / 1000.0

# hlo op_name map
name_to_op = {}
pat = re.compile(r"%(\S+) = .*?op_name=\"([^\"]*)\"")
for line in open("/root/repo/tmp/train_step.hlo"):
    m = pat.search(line)
    if m:
        name_to_op[m.group(1)] = m.group(2)

def module_of(op):
    # strip jit wrappers, keep the unet-relative path + op kind
    m = re.search(r"unet/([^\"]*)", op)
    return m.group(1) if m else op.split("/")[-1]

by_mod = collections.Counter()
by_kind_mod = collections.Counter()
unattr = 0.0
for name, ms in dur.items():
    if name.startswith(("jit_", "while")) or name in ("run",):
        continue
    op = name_to_op.get(name)
    if op is None:
        unattr += ms
        continue
    mod = module_of(op)
    # collapse block index and leaf op
    mod_short = re.sub(r"/(reshape|conv_general_dilated|add_any|mul|add|transpose|convert_element_type|reduce_sum|dot_general|concatenate|pad|slice|max|min|sub|div|rsqrt|integer_pow|select_n|broadcast_in_dim|iota|exp|log1p|logistic|neg|sign|abs|sqrt|squeeze|dynamic_slice|dynamic_update_slice|custom_[a-z_]*|rev|reduce_max|reduce_min|clamp).*", "", op[op.find("unet/")+5:] if "unet/" in op else op)
    kind = name.split(".")[0]
    by_mod[mod_short] += ms
    by_kind_mod[(kind, mod_short)] += ms

tot = sum(by_mod.values())
print(f"attributed: {tot:.1f} ms, unattributed: {unattr:.1f} ms (10 steps)")
print("--- by module path (top 30)")
for k, v in by_mod.most_common(30):
    print(f"{v:8.1f} ms  {k}")
print("--- copies by module (top 15)")
cp = collections.Counter({k[1]: v for k, v in by_kind_mod.items() if k[0] in ("copy",)})
for k, v in cp.most_common(15):
    print(f"{v:8.1f} ms  {k}")
print("copy total:", round(sum(cp.values()),1))
