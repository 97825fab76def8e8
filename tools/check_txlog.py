#!/usr/bin/env python3
"""Independent replay of a txtable commit log (driver-side tool, not a
library dependency): a second implementation, in another language, of
the log format's DOCUMENTED semantics. If the Scala engine and this
script disagree on a table's active-file set, one of them misreads the
format — the same cross-check shape as check_sas_pandas.py.

Usage:
  python3 tools/check_txlog.py <tableDir> [version]
  python3 tools/check_txlog.py <tableDir> --prune <column> <lo> <hi>
  python3 tools/check_txlog.py <tableDir> --schema [--dump <out.parquet>]
  python3 tools/check_txlog.py <tableDir> --at-ts <epochMillis>
  python3 tools/check_txlog.py <tableDir> --append <src.parquet>
                                [--stale-ms N] [--hold-ms N]

--append is the WRITE half of the cross-implementation guarantee: it
stages <src.parquet> into the table, mines its footer stats into a
`<v>.stats.tsv` sidecar, stamps a monotone in-commit timestamp
(max(wall, prev_ts + 1)), and lands the entry at the next contiguous
version through the documented conditional-PUT claim protocol
(O_EXCL claim -> temp write + fsync -> token re-check -> atomic
rename; stale claims stolen via the graveyard rename). Racing writers
lose cleanly and retry the next version. The capability gate mirrors
the engine's: this writer implements writer protocol v1 (plain
appends), so tables carrying constraints, generated/identity columns,
column mapping, or write-side DEFAULTs refuse loudly. --hold-ms
stalls between claim and content write (the stolen-while-stalled test
seam). Prints {"version": N, "appended": rel}.

--at-ts resolves the target version by TIMESTAMP (newest commit whose
in-commit timestamp is <= the target — monotone, so deterministic) and
replays that; combine with --schema/--dump freely. Partitioned layouts
are first-class: partition columns are derived from the manifest's
`col=value/` path segments (schema) and surfaced via hive partitioning
(dump).

Prints one JSON line: {"version": N, "files": [...sorted rel names],
"dvs": [...], "tokens": [...]}. With --prune, adds "pruned": the
data files whose logged [min,max] stats for <column> may intersect
[<lo>, <hi>] (files without stats for the column are always KEPT —
the conservative contract). With --schema, adds "schema": the fully
DECODED metadata-token surface (column mapping, dropped physicals,
generated columns, identity, constraints, properties, column
DEFAULTs) plus the LOGICAL column list derived from the active files'
parquet footers under that mapping; --dump additionally materializes
the TRANSLATED LOGICAL READ (deletion vectors anti-joined on
(file, row ordinal), dropped physicals excluded, renames applied,
exists-defaults coalesced) to a parquet file via DuckDB — a second
implementation of the READ path, not just the list replay. Exit 0 on
a clean resolve, nonzero on a malformed log. The Scala spec
(TxLogInteropSpec) compares all of it against the engine.

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
   rest are data files;
 - column stats ride `<v>.stats.tsv` sidecars: 5-field TSV rows
   `file \t column \t kind \t min \t max` (tab/newline/%% escaped as
   %%09/%%0a/%%0d/%%25 in file and column), later entries winning per
   (file, column). A sidecar whose FIRST line starts with
   `#consolidated` carries the full active-file stats as of its
   version: bounded loading reads the pointer checkpoint's
   consolidated sidecar plus the contiguous tail of per-commit
   sidecars above it (one per existing commit entry) — a file with no
   stats for the probed column always prunes KEEP.
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


def dec(s):
    # mirror of the engine's escaping, decode order included
    return (s.replace("%09", "\t").replace("%0a", "\n")
             .replace("%0d", "\r").replace("%25", "%"))


def fold_stats(acc, path):
    """One sidecar into the file -> column -> (kind, min, max) map;
    later lines win, non-5-field lines (incl. the marker) skip."""
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            parts = line.split("\t")
            if len(parts) != 5:
                continue
            rel, col, kind, mn, mx = parts
            acc.setdefault(dec(rel), {})[dec(col)] = (kind, mn, mx)
    return acc


def stats_consolidated(path):
    if not os.path.isfile(path):
        return False
    with open(path, encoding="utf-8") as f:
        return f.readline().startswith("#consolidated")


def load_stats(log_dir, entries):
    """BOUNDED like the engine: a validated pointer naming a
    checkpoint with a #consolidated sidecar anchors the load (that one
    file + the contiguous per-commit tail); any doubt falls back to
    folding every sidecar in listing order."""
    def stats_file(v):
        return os.path.join(log_dir, "%020d.stats.tsv" % v)
    ptr = os.path.join(log_dir, "_last_checkpoint")
    if os.path.isfile(ptr):
        try:
            pv = json.load(open(ptr, encoding="utf-8"))["version"]
            if (os.path.isfile(os.path.join(log_dir,
                                            "%020d.ckpt.json" % pv))
                    and stats_consolidated(stats_file(pv))):
                acc = fold_stats({}, stats_file(pv))
                v = pv + 1
                while v in entries:
                    if os.path.isfile(stats_file(v)):
                        fold_stats(acc, stats_file(v))
                    v += 1
                return acc
        except Exception:
            pass  # torn/stale pointer: fall back to the listing
    acc = {}
    for name in sorted(os.listdir(log_dir)):
        if name.endswith(".stats.tsv"):
            fold_stats(acc, os.path.join(log_dir, name))
    return acc


def b64u(s):
    """base64url without padding — the engine's token codec."""
    import base64
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4)).decode("utf-8")


def split_tok(body):
    """Token bodies are `<part>.<rest>`; the first '.' separates (the
    left part's alphabet — base64url or [A-Za-z0-9_-] names — never
    contains '.')."""
    i = body.index(".")
    return body[:i], body[i + 1:]


def decode_tokens(tokens):
    """The metadata-token surface from documented semantics alone:
    cm- logical->physical mapping, cmx- dropped physicals, gc-
    generated columns, id- identity (start/step/highWater), ct-
    constraints (plain name + b64 expr), tp- properties (of which
    txtable.default.* / txtable.existsDefault.* are column DEFAULTs),
    txn- markers, pv- protocol, cp- copy ledger."""
    meta = {"mapping": {}, "dropped_physical": [], "generated": {},
            "identity": {}, "constraints": {}, "properties": {},
            "txn": {}, "protocol": None, "copied": []}
    for t in tokens:
        if t.startswith("cmx-"):
            meta["dropped_physical"].append(b64u(t[4:]))
        elif t.startswith("cm-"):
            lo, ph = split_tok(t[3:])
            meta["mapping"][b64u(lo)] = b64u(ph)
        elif t.startswith("gc-"):
            n, e = split_tok(t[3:])
            meta["generated"][b64u(n)] = b64u(e)
        elif t.startswith("ct-"):
            n, e = split_tok(t[3:])
            meta["constraints"][n] = b64u(e)
        elif t.startswith("tp-"):
            k, v = split_tok(t[3:])
            meta["properties"][b64u(k)] = b64u(v)
        elif t.startswith("id-"):
            n, rest = split_tok(t[3:])
            st, sp, hw = rest.split(".")
            meta["identity"][b64u(n)] = [int(st), int(sp), int(hw)]
        elif t.startswith("txn-"):
            a, v = split_tok(t[4:])
            meta["txn"][b64u(a)] = int(v)
        elif t.startswith("pv-"):
            r, w = t[3:].split(".")
            meta["protocol"] = [int(r), int(w)]
        elif t.startswith("cp-"):
            meta["copied"].append(b64u(t[3:]))
    meta["dropped_physical"].sort()
    meta["copied"].sort()
    dp, xp = "txtable.default.", "txtable.existsDefault."
    meta["defaults"] = {k[len(dp):]: v
                        for k, v in meta["properties"].items()
                        if k.startswith(dp)}
    meta["exists_defaults"] = {k[len(xp):]: v
                               for k, v in meta["properties"].items()
                               if k.startswith(xp)}
    return meta


def physical_order(table_dir, files):
    """Ordered union of the active files' parquet footer columns —
    the schema-on-read the engine's merged scan serves."""
    import pyarrow.parquet as pq
    seen, order = set(), []
    for f in files:
        for name in pq.read_schema(os.path.join(table_dir, f)).names:
            if name not in seen:
                seen.add(name)
                order.append(name)
    return order


def unescape_path(s):
    """Hive path-segment unescape (%XX), the engine/Spark convention."""
    out, i = [], 0
    while i < len(s):
        if s[i] == "%" and i + 2 < len(s) + 1 and i + 3 <= len(s):
            try:
                out.append(chr(int(s[i + 1:i + 3], 16)))
                i += 3
                continue
            except ValueError:
                pass
        out.append(s[i])
        i += 1
    return "".join(out)


def partition_columns(files):
    """Hive-layout partition columns, in path order: active files of a
    partitioned table are logged partition-qualified
    (`col=value/.../name.parquet`), so the column names ride the
    manifest itself — no listing, no footer read."""
    order, seen = [], set()
    for f in files:
        for seg in f.split("/")[:-1]:
            if "=" in seg:
                name = unescape_path(seg.split("=", 1)[0])
                if name not in seen:
                    seen.add(name)
                    order.append(name)
    return order


def logical_columns(phys, meta):
    """Physical footer columns -> logical view: dropped physicals
    disappear, mapped physicals surface under their logical names."""
    inv = {p: l for l, p in meta["mapping"].items()}
    dropped = set(meta["dropped_physical"])
    return [inv.get(p, p) for p in phys if p not in dropped]


def qid(name):
    return '"' + name.replace('"', '""') + '"'


def dump_read(table_dir, files, dvs, meta, out_path):
    """The TRANSLATED LOGICAL READ, independently in DuckDB: active
    data files union-by-name, deletion vectors anti-joined on
    (table-relative file name, row ordinal in file), dropped physical
    columns excluded, renames applied, exists-defaults coalesced over
    the null-fill of pre-evolve files (explicit NULLs are rejected at
    write by the engine, so the coalesce is exact). Returns the row
    count written."""
    import duckdb
    con = duckdb.connect()
    prefix = table_dir.rstrip("/") + "/"

    def lit(p):
        return "'" + p.replace("'", "''") + "'"
    file_list = ", ".join(lit(os.path.join(table_dir, f)) for f in files)
    # hive_partitioning surfaces col=value path segments as columns —
    # the engine's basePath read does the same for partitioned layouts
    hive = ", hive_partitioning=true" if partition_columns(files) else ""
    base = ("SELECT * FROM read_parquet([%s], union_by_name=true, "
            "filename=true, file_row_number=true%s)" % (file_list, hive))
    if dvs:
        dv_list = ", ".join(lit(os.path.join(table_dir, d)) for d in dvs)
        base = ("SELECT * FROM (%s) b WHERE NOT EXISTS ("
                "SELECT 1 FROM read_parquet([%s]) d "
                "WHERE d._dv_file = substr(b.filename, %d) "
                "AND d._dv_pos = b.file_row_number)"
                % (base, dv_list, len(prefix) + 1))
    phys = physical_order(table_dir, files) + partition_columns(files)
    inv = {p: l for l, p in meta["mapping"].items()}
    dropped = set(meta["dropped_physical"])
    cols = []
    for p in phys:
        if p in dropped:
            continue
        logical = inv.get(p, p)
        e = qid(p)
        if logical in meta["exists_defaults"]:
            e = "coalesce(%s, %s)" % (e, meta["exists_defaults"][logical])
        cols.append("%s AS %s" % (e, qid(logical)))
    sql = "SELECT %s FROM (%s)" % (", ".join(cols), base)
    con.sql("COPY (%s) TO %s (FORMAT PARQUET)" % (sql, lit(out_path)))
    return con.sql("SELECT count(*) FROM %s"
                   % lit(out_path)).fetchone()[0]


def enc(s):
    """Write-side mirror of dec(): percent FIRST, so the escapes it
    introduces are not double-encoded."""
    return (s.replace("%", "%25").replace("\t", "%09")
             .replace("\n", "%0a").replace("\r", "%0d"))


def mine_stats(table_dir, rel):
    """Footer-mined per-column stats lines for one staged data file —
    the write-side mirror of load_stats: `file \\t column \\t kind \\t
    min \\t max`, kind in long/double/string, a column dropped when any
    row group lacks usable stats (the engine's fileStats contract)."""
    import pyarrow.parquet as pq
    md = pq.ParquetFile(os.path.join(table_dir, rel)).metadata
    if md.num_row_groups == 0:
        return []
    # per column: list of (kind, min, max) across row groups; a column
    # folds only when EVERY row group contributed usable stats
    per_col = {}
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        for i in range(rg.num_columns):
            c = rg.column(i)
            name = c.path_in_schema
            st = c.statistics
            pt = c.physical_type
            if "." in name:
                kind = None  # nested: single-segment paths only
            elif pt in ("INT32", "INT64"):
                kind = "long"
            elif pt in ("FLOAT", "DOUBLE"):
                kind = "double"
            elif pt == "BYTE_ARRAY" and \
                    "String" in str(md.schema.column(i).logical_type):
                kind = "string"
            else:
                kind = None
            if kind is None or st is None or not st.has_min_max:
                per_col.setdefault(name, []).append(None)
            else:
                per_col.setdefault(name, []).append((kind, st.min, st.max))
    lines = []
    for name in sorted(per_col):
        groups = per_col[name]
        if any(v is None for v in groups):
            continue
        kind = groups[0][0]
        mn = min(v[1] for v in groups)
        mx = max(v[2] for v in groups)
        if kind == "string":
            mn, mx = enc(str(mn)), enc(str(mx))
        lines.append("%s\t%s\t%s\t%s\t%s"
                     % (enc(rel), enc(name), kind, mn, mx))
    return lines


class Refused(SystemExit):
    pass


def append_gate(meta):
    """Capability gate, mirroring the engine's write-side protocol
    contract: THIS writer implements writer v1 — plain data-file
    appends with footer stats. Tables carrying features whose write
    path it cannot honor (constraint enforcement, generated/identity
    column computation, column-mapped physical names, write-side
    DEFAULT fill) refuse LOUDLY, exactly like an old engine build
    refusing a table whose pv- token outruns its writerCap."""
    if meta["protocol"] and meta["protocol"][1] > 1:
        raise Refused("table requires writer protocol v%d; this "
                      "writer implements v1 (plain appends)"
                      % meta["protocol"][1])
    for feature, bag in (("CHECK constraints", meta["constraints"]),
                         ("generated columns", meta["generated"]),
                         ("identity columns", meta["identity"]),
                         ("column mapping", meta["mapping"]),
                         ("dropped physical columns",
                          meta["dropped_physical"]),
                         ("write-side column DEFAULTs",
                          meta["defaults"])):
        if bag:
            raise Refused("table carries %s, which this writer cannot "
                          "honor on the write path — refusing the "
                          "append" % feature)


def claim_put(entry_path, content, stale_ms, hold_ms=0):
    """One conditional PUT of `content` at `entry_path` through the
    DOCUMENTED claim protocol (LogStore.FileConditionalPut): O_EXCL
    claim -> temp write + fsync -> token re-check -> atomic rename.
    Returns True = created, False = key already decided. A stale
    claim (mtime older than stale_ms) is stolen via the atomic
    graveyard rename. `hold_ms` stalls between claim and content
    write — the test seam for the stolen-while-stalled path."""
    import time
    import uuid
    log_dir = os.path.dirname(entry_path)
    claim = entry_path + ".claim"
    token = uuid.uuid4().hex

    def owns():
        try:
            with open(claim, encoding="utf-8") as f:
                return f.read() == token
        except OSError:
            return False

    while True:
        if os.path.exists(entry_path):
            return False
        try:
            fd = os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            try:
                os.write(fd, token.encode("utf-8"))
                os.fsync(fd)
            finally:
                os.close(fd)
            claimed = True
        except FileExistsError:
            claimed = False
        if claimed:
            # the key may have landed between the entry check and the
            # claim grab — losing now keeps entries immutable
            if os.path.exists(entry_path):
                os.unlink(claim)
                return False
            if hold_ms:
                time.sleep(hold_ms / 1000.0)
            tmp = os.path.join(log_dir, ".cput-" + token)
            try:
                with open(tmp, "wb") as f:
                    f.write(content)
                    f.flush()
                    os.fsync(f.fileno())
            except OSError:
                if owns():
                    os.unlink(claim)
                raise
            # token re-check immediately before the rename: a stall
            # past the stale horizon may have been stolen — only the
            # current holder renames, never over a decided key
            if not owns():
                os.unlink(tmp)
                continue  # stolen: re-arbitrate
            if os.path.exists(entry_path):
                os.unlink(tmp)
                if owns():
                    os.unlink(claim)
                return False
            os.rename(tmp, entry_path)
            try:
                os.unlink(claim)
            except OSError:
                pass
            return True
        if os.path.exists(entry_path):
            return False  # the claimant finished: a normal lost PUT
        try:
            age_ms = (time.time() - os.path.getmtime(claim)) * 1000.0
        except OSError:
            continue  # claimant vanished: re-arbitrate
        if age_ms > stale_ms:
            # stale claim: steal — the graveyard rename is atomic, so
            # exactly one stealer proceeds
            grave = os.path.join(log_dir, ".dead-" + uuid.uuid4().hex)
            try:
                os.rename(claim, grave)
                os.unlink(grave)
            except OSError:
                pass  # lost the steal: loop
        else:
            time.sleep(0.02)  # a LIVE writer is mid-PUT: wait it out


def append_table(table_dir, src, stale_ms=600000, hold_ms=0):
    """Append `src` (a parquet file) to the table as ONE commit,
    through the documented write contract: stage the data file into
    the table dir, stamp a monotone in-commit timestamp
    (max(wall, prev_ts + 1)), render the entry JSON, conditional-PUT
    it at the next contiguous version (racing writers lose cleanly
    and retry the following version), then land the footer-mined
    stats sidecar. Returns (version, rel_name)."""
    import shutil
    import time
    import uuid
    log_dir = os.path.join(table_dir, "_log")
    os.makedirs(log_dir, exist_ok=True)
    version, active = resolve(table_dir, 1 << 62)
    append_gate(decode_tokens([f for f in active if is_meta(f)]))
    rel = "part-py-%s.parquet" % uuid.uuid4().hex
    shutil.copyfile(src, os.path.join(table_dir, rel))
    stats = mine_stats(table_dir, rel)
    nbytes = os.path.getsize(os.path.join(table_dir, rel))
    v = version + 1
    while True:
        entries, _ = list_log(log_dir)
        while v in entries:
            v += 1
        prev_ts = read_entry(entries[v - 1])["ts"] if (v - 1) in entries \
            else -(1 << 62)
        ts = max(int(time.time() * 1000), prev_ts + 1)
        body = ('{"version":%d,"action":"append","add":["%s"],'
                '"remove":[],"ts":%d,"bytes":%d,"rmBytes":0}'
                % (v, rel, ts, nbytes))
        entry_path = os.path.join(log_dir, "%020d.json" % v)
        if claim_put(entry_path, body.encode("utf-8"), stale_ms,
                     hold_ms=hold_ms):
            if stats:
                with open(os.path.join(log_dir, "%020d.stats.tsv" % v),
                          "w", encoding="utf-8") as f:
                    f.write("\n".join(stats))
            return v, rel
        v += 1  # lost the race at v: the next contiguous slot


def may_overlap(kind, mn, mx, lo, hi):
    """Could a file spanning [mn, mx] hold a value in [lo, hi]?
    Conservative on any doubt, mirroring the engine."""
    if kind in ("long", "double"):
        from decimal import Decimal, InvalidOperation

        def bd(s):
            try:
                return Decimal(s)
            except (InvalidOperation, ValueError):
                return None
        fmin, fmax = bd(mn), bd(mx)
        qlo, qhi = bd(lo), bd(hi)
        if fmin is None or fmax is None or qlo is None or qhi is None:
            return True
        return qlo <= fmax and qhi >= fmin
    if kind == "string":
        return lo <= dec(mx) and hi >= dec(mn)
    return True


def main():
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    table_dir = sys.argv[1]
    prune = None
    schema = False
    dump = None
    rest = sys.argv[2:]
    if "--append" in rest:
        i = rest.index("--append")
        src = rest[i + 1]
        rest = rest[:i] + rest[i + 2:]
        stale_ms = 600000
        if "--stale-ms" in rest:
            j = rest.index("--stale-ms")
            stale_ms = int(rest[j + 1])
            rest = rest[:j] + rest[j + 2:]
        hold_ms = 0
        if "--hold-ms" in rest:
            j = rest.index("--hold-ms")
            hold_ms = int(rest[j + 1])
            rest = rest[:j] + rest[j + 2:]
        v, rel = append_table(table_dir, src, stale_ms, hold_ms)
        print(json.dumps({"version": v, "appended": rel},
                         sort_keys=True))
        return
    if "--prune" in rest:
        i = rest.index("--prune")
        prune = tuple(rest[i + 1:i + 4])
        if len(prune) != 3:
            raise SystemExit("--prune needs <column> <lo> <hi>")
        rest = rest[:i] + rest[i + 4:]
    if "--dump" in rest:
        i = rest.index("--dump")
        dump = rest[i + 1]
        rest = rest[:i] + rest[i + 2:]
        schema = True
    if "--schema" in rest:
        rest.remove("--schema")
        schema = True
    at_ts = None
    if "--at-ts" in rest:
        i = rest.index("--at-ts")
        at_ts = int(rest[i + 1])
        rest = rest[:i] + rest[i + 2:]
    target = int(rest[0]) if rest else (1 << 62)
    if at_ts is not None:
        # timestamp time travel from documented semantics: the NEWEST
        # version whose commit timestamp is <= the target, in VERSION
        # order (in-commit timestamps are monotone, so this resolves
        # deterministically under wall-clock regression — the engine's
        # versionAsOf contract)
        log_dir = os.path.join(table_dir, "_log")
        entries, _ = list_log(log_dir)
        hits = [v for v in sorted(entries)
                if read_entry(entries[v])["ts"] <= at_ts]
        if not hits:
            raise SystemExit("no commit at or before ts=%d" % at_ts)
        target = hits[-1]
    version, active = resolve(table_dir, target)
    files = sorted(f for f in active if not is_meta(f) and not is_dv(f))
    dvs = sorted(f for f in active if is_dv(f) and not is_meta(f))
    tokens = sorted(f for f in active if is_meta(f))
    out = {"version": version, "files": files, "dvs": dvs,
           "tokens": tokens}
    if schema:
        meta = decode_tokens(tokens)
        meta["logical_columns"] = sorted(logical_columns(
            physical_order(table_dir, files) + partition_columns(files),
            meta))
        out["schema"] = meta
        if dump is not None:
            out["dumped"] = dump
            out["rows"] = dump_read(table_dir, files, dvs, meta, dump)
    if prune is not None:
        col, lo, hi = prune
        # stats sidecars key by PHYSICAL column name: a probe on a
        # RENAMED column must translate through the cm- mapping first
        # (the engine's prunedSnapshot does the same via physName)
        col = decode_tokens(tokens)["mapping"].get(col, col)
        log_dir = os.path.join(table_dir, "_log")
        entries, _ = list_log(log_dir)
        stats = load_stats(log_dir, entries)
        out["pruned"] = [
            f for f in files
            if col not in stats.get(f, {})
            or may_overlap(*stats[f][col], lo, hi)]
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
