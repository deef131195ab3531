import collections, glob, gzip, json, re, sys
paths = glob.glob("/tmp/kcpp_prof16k/**/*.trace.json.gz", recursive=True)
with gzip.open(sorted(paths)[-1], "rt") as f:
    trace = json.load(f)
events = trace["traceEvents"]
pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
dev = {p for p, n in pid_names.items() if "TPU" in n}
agg = collections.Counter(); total = 0.0
for e in events:
    if e.get("ph") != "X" or e.get("pid") not in dev: continue
    name = e["name"]
    if name.startswith("jit_") or name.startswith("while"): continue
    fam = re.sub(r"[.\d]+$", "", name)
    agg[fam] += e.get("dur", 0); total += e.get("dur", 0)
n = 64
print(f"TAG {sys.argv[1]} total leaf {total/n:.0f} us/step")
for name, dur in agg.most_common(12):
    print(f"  {dur/n:9.1f} us {100*dur/total:5.1f}%  {name[:80]}")
