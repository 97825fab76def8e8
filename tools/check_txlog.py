#!/usr/bin/env python3
"""Independent replay of a txtable commit log (driver-side tool, not a
library dependency): a second implementation, in another language, of
the log format's DOCUMENTED semantics. If the Scala engine and this
script disagree on a table's active-file set, one of them misreads the
format — the same cross-check shape as check_sas_pandas.py.

Usage:
  python3 tools/check_txlog.py <tableDir> [version]

Prints one JSON line: {"version": N, "files": [...sorted rel names],
"dvs": [...], "tokens": [...]}. Exit 0 on a clean resolve, nonzero on
a malformed log. The Scala spec (TxLogInteropSpec) compares this
against the engine's own snapshot.

Replayed semantics (the format contract):
 - a commit is `_log/<20-digit version>.json` holding
   {"version","action","add":[],"remove":[],"ts","bytes","rmBytes"};
 - a checkpoint `<v>.ckpt.json` holds the fully-replayed inventory at
   v; an inventory of exactly ["pqref:<name>"] points at a parquet
   sidecar directory whose rows (i, n) restore the list in order;
 - `_log/_last_checkpoint` ({"version":N}) is a pure accelerator:
   trusted only if its checkpoint exists, else fall back to listing;
 - resolution: newest checkpoint <= target, then the CONTIGUOUS run
   of commits above it up to the target; replay folds
   active = (active - remove) + add;
 - the active list splits by prefix: dv-* are deletion vectors;
   ct-/cm-/cmx-/pv-/gc-/id-/txn-/tp-/cp-* are metadata tokens; the
   rest are data files.
"""
import json
import os
import re
import sys

META_PREFIXES = ("ct-", "cm-", "cmx-", "pv-", "gc-", "id-", "txn-",
                 "tp-", "cp-")


def is_meta(name):
    return name.startswith(META_PREFIXES)


def is_dv(name):
    return name.rsplit("/", 1)[-1].startswith("dv-")


def read_entry(path):
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)


def hydrate_ckpt(log_dir, entry):
    add = entry["add"]
    if len(add) == 1 and add[0].startswith("pqref:"):
        import pyarrow.parquet as pq
        sidecar = os.path.join(log_dir, add[0][len("pqref:"):])
        table = pq.read_table(sidecar).to_pydict()
        rows = sorted(zip(table["i"], table["n"]))
        entry = dict(entry)
        entry["add"] = [n for _, n in rows]
    return entry


def list_log(log_dir):
    entries, ckpts = {}, {}
    pat = re.compile(r"^(\d{20})(\.ckpt)?\.json$")
    for name in os.listdir(log_dir):
        m = pat.match(name)
        if not m:
            continue
        v = int(m.group(1))
        (ckpts if m.group(2) else entries)[v] = os.path.join(log_dir, name)
    return entries, ckpts


def resolve(table_dir, target):
    log_dir = os.path.join(table_dir, "_log")
    entries, ckpts = list_log(log_dir)
    ck = None
    # the pointer, trusted only when its checkpoint exists
    ptr = os.path.join(log_dir, "_last_checkpoint")
    if os.path.isfile(ptr):
        try:
            v = json.load(open(ptr, encoding="utf-8"))["version"]
            if v in ckpts and v <= target:
                ck = hydrate_ckpt(log_dir, read_entry(ckpts[v]))
        except Exception:
            ck = None  # torn/stale: fall back to the listing
    if ck is None and ckpts:
        usable = [v for v in ckpts if v <= target]
        if usable:
            ck = hydrate_ckpt(log_dir, read_entry(ckpts[max(usable)]))
    if ck is None and entries and min(entries) > 0:
        raise SystemExit("log cleaned below v%d and no usable checkpoint"
                         % min(entries))
    active = list(ck["add"]) if ck else []
    version = ck["version"] if ck else -1
    v = version + 1
    while v in entries and v <= target:
        c = read_entry(entries[v])
        if c["version"] != v:
            raise SystemExit("entry %s declares version %s"
                             % (entries[v], c["version"]))
        rm = set(c["remove"])
        active = [f for f in active if f not in rm] + list(c["add"])
        version = v
        v += 1
    return version, active


def main():
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    table_dir = sys.argv[1]
    target = int(sys.argv[2]) if len(sys.argv) > 2 else (1 << 62)
    version, active = resolve(table_dir, target)
    files = sorted(f for f in active if not is_meta(f) and not is_dv(f))
    dvs = sorted(f for f in active if is_dv(f) and not is_meta(f))
    tokens = sorted(f for f in active if is_meta(f))
    print(json.dumps({"version": version, "files": files, "dvs": dvs,
                      "tokens": tokens}, sort_keys=True))


if __name__ == "__main__":
    main()
