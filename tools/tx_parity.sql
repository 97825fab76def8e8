-- End-to-end transactional-table parity script: pure SQL, no Scala.
-- Run by graft.tools.ExtensionsCheck in a FRESH session configured
-- with spark.sql.extensions=graft.plans.GraftExtensions; ${DIR} is
-- substituted with a scratch directory holding a plain-parquet lake
-- at ${DIR}/lake (written by ordinary Spark, 6 rows: id 1-6, v=10*id)
-- plus two ingest drops at ${DIR}/in1 (4 rows) and ${DIR}/in2 (3).
-- Statements run in order; the runner asserts each one's effect.

-- 1. adopt the existing parquet lake in place (zero bytes rewritten)
CONVERT TO TXTABLE parquet.`${DIR}/lake`;

-- 2. widen the schema without touching data (O(1) evolve commit)
ALTER TABLE txtable.`${DIR}/lake` ADD COLUMNS (status STRING);

-- 3. a CDC batch as an inline view: update id=2, delete id=3, insert id=9
CREATE TEMPORARY VIEW tx_parity_cdc AS
SELECT * FROM VALUES (2L, 999L, 'U'), (3L, CAST(NULL AS LONG), 'D'),
                     (9L, 90L, 'I') AS v(id, v, op);

-- 4. apply it with full MERGE clause surface (SQL order honored)
MERGE INTO txtable.`${DIR}/lake` t USING tx_parity_cdc s ON t.id = s.id
WHEN MATCHED AND s.op = 'D' THEN DELETE
WHEN MATCHED THEN UPDATE SET v = s.v, status = 'merged'
WHEN NOT MATCHED THEN INSERT (id, v, status) VALUES (s.id, s.v, 'new');

-- 5. time travel still serves the pre-DML snapshot
SELECT COUNT(*) AS n0 FROM txtable.`${DIR}/lake` VERSION AS OF 0;

-- 6. compact the small files the DML left behind
OPTIMIZE txtable.`${DIR}/lake`;

-- 7. multi-dimensionally cluster for two-sided range scans
OPTIMIZE txtable.`${DIR}/lake` ZORDER BY (id, v);

-- 8. declare an engine-allocated surrogate key; the INSERT's NULL
--    slot means DEFAULT and the engine assigns 1
ALTER TABLE txtable.`${DIR}/lake` ADD IDENTITY COLUMN rid;
INSERT INTO txtable.`${DIR}/lake`
SELECT 77L, 770L, 'ins', CAST(NULL AS LONG);

-- 9. age-based retention (everything here is younger than 168h:
--    returns an empty reclaim list, the statement itself must run)
VACUUM txtable.`${DIR}/lake` RETAIN 168 HOURS;

-- 10. the operational safety valve: list, don't delete
VACUUM txtable.`${DIR}/lake` DRY RUN;

-- 11-12. key/value table metadata, set and read back
ALTER TABLE txtable.`${DIR}/lake`
SET TBLPROPERTIES ('txtable.logRetentionVersions'='100', 'owner'='etl');
SHOW TBLPROPERTIES txtable.`${DIR}/lake`;

-- 13. log retention as a statement (window far wider than the log:
--     cuts nothing, must still run)
CLEANUP LOG txtable.`${DIR}/lake` RETAIN 100 VERSIONS;

-- 14. the full audit trail is queryable
DESCRIBE HISTORY txtable.`${DIR}/lake`;

-- 15-17. hive-partitioned CTAS, then partition-scoped maintenance:
--        OPTIMIZE ... WHERE repacks ONE leaf and mentions nothing
--        else; the ZORDER BY form re-CLUSTERS one leaf (incremental
--        clustering — the only kind that exists at table scale)
CREATE TABLE tx_parity_parts USING txtable PARTITIONED BY (seg)
LOCATION '${DIR}/parts' AS
SELECT id, id * 3 AS w,
       CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END AS seg
FROM VALUES (1L), (2L), (3L), (4L) AS p(id);
OPTIMIZE txtable.`${DIR}/parts` WHERE seg = 'even';
OPTIMIZE txtable.`${DIR}/parts` WHERE seg = 'odd' ZORDER BY (id, w);

-- 18-20. idempotent file ingest: the per-file ledger loads each drop
--        once — the rerun of in1 is a no-op, in2 adds only its own rows
COPY INTO txtable.`${DIR}/copied` FROM '${DIR}/in1' FILEFORMAT = PARQUET;
COPY INTO txtable.`${DIR}/copied` FROM '${DIR}/in1' FILEFORMAT = PARQUET;
COPY INTO txtable.`${DIR}/copied` FROM '${DIR}/in2' FILEFORMAT = PARQUET;

-- 21-22. point-in-time recovery: back to the first ingest, by commit
RESTORE TABLE txtable.`${DIR}/copied` TO VERSION AS OF 0;
SELECT COUNT(*) AS n_restored FROM txtable.`${DIR}/copied`;

-- 23. identity in CREATE TABLE column DDL (Delta's primary surface);
--     each INSERT's NULL slot means DEFAULT and the engine allocates
--     100, 101 — declared schema serves reads before any data lands
CREATE TABLE tx_parity_dim (uid BIGINT GENERATED ALWAYS AS IDENTITY
  (START WITH 100 INCREMENT BY 1), name STRING)
USING txtable LOCATION '${DIR}/dim';

INSERT INTO tx_parity_dim VALUES (CAST(NULL AS BIGINT), 'alpha');

INSERT INTO tx_parity_dim VALUES (CAST(NULL AS BIGINT), 'beta');

SELECT uid, name FROM tx_parity_dim ORDER BY uid;

-- 28-30. DECLARATIVE clustering: the column set is declared ONCE at
--        CREATE (liquid-clustering entry point); a bare OPTIMIZE then
--        reclusters on it — no ZORDER BY spelled at maintenance time
CREATE TABLE tx_parity_clst (k BIGINT, v BIGINT) USING txtable
CLUSTER BY (k, v) LOCATION '${DIR}/clst';

INSERT INTO tx_parity_clst
SELECT id, id * 2 FROM VALUES (1L), (2L), (3L), (4L) AS c(id);

OPTIMIZE tx_parity_clst;

-- 31. time travel over a CATALOG NAME (not just txtable.`path`):
--     the CTAS snapshot is version 0
SELECT COUNT(*) AS n_tt FROM tx_parity_parts VERSION AS OF 0;

-- 32. the CDF as a table-valued function over a catalog name
--     (Delta's table_changes): versions 1-2 are the two INSERTs
SELECT COUNT(*) AS n_cdf FROM table_changes('tx_parity_dim', 1, 2);

-- 33-35. CREATE OR REPLACE ... AS SELECT: first run creates, second
--        replaces the content as ONE replace commit at the same
--        location — the pre-replace snapshot stays time-travelable
CREATE OR REPLACE TABLE tx_parity_rtas USING txtable
LOCATION '${DIR}/rtas' AS
SELECT id AS k, id * 7 AS v FROM VALUES (1L), (2L), (3L), (4L) AS r(id);

CREATE OR REPLACE TABLE tx_parity_rtas USING txtable
LOCATION '${DIR}/rtas' AS
SELECT id AS k, id * 9 AS v FROM VALUES (9L), (10L) AS r(id);

SELECT COUNT(*) AS n_pre FROM tx_parity_rtas VERSION AS OF 0;

-- 36. OPTIMIZE FULL: bare OPTIMIZE on a clustered table is
--     INCREMENTAL (no-op here — nothing new since stmt 30's
--     recluster); FULL forces the re-sort and re-arms the watermark
OPTIMIZE tx_parity_clst FULL;

-- 37-40. MATERIALIZED VIEW lifecycle: CREATE populates from the
--        current base snapshot (NULL is a group like any other); a
--        base UPDATE moves a row ACROSS groups; REFRESH folds only
--        the change window; the view reads like any table
CREATE MATERIALIZED VIEW txtable.`${DIR}/lakemv` AS
SELECT status, COUNT(*) AS n_rows, SUM(v) AS v_sum
FROM txtable.`${DIR}/lake` GROUP BY status;

UPDATE txtable.`${DIR}/lake` SET v = v + 1, status = 'merged'
WHERE id = 5;

REFRESH MATERIALIZED VIEW txtable.`${DIR}/lakemv`;

SELECT status, n_rows, v_sum FROM txtable.`${DIR}/lakemv`
ORDER BY status;

-- 41-43. column DDL completeness: DEFAULT fills a column the INSERT's
--        column list omits; NOT NULL is engine-ENFORCED as a CHECK
--        constraint, not just recorded in the catalog entry
CREATE TABLE tx_parity_dflt (id BIGINT NOT NULL,
  src STRING DEFAULT 'etl') USING txtable LOCATION '${DIR}/dflt';

INSERT INTO tx_parity_dflt (id) SELECT 5;

SELECT id, src FROM tx_parity_dflt;

-- 44-49. MIN/MAX materialized view: extrema fold under inserts and
--        survive a DELETE retiring a group's maximum via the bounded
--        per-group recompute (only the touched group re-aggregates
--        from the base, through the stats-pruned read)
CREATE TABLE tx_parity_mm (g BIGINT, v BIGINT) USING txtable
  LOCATION '${DIR}/mm';

INSERT INTO tx_parity_mm VALUES (1L, 10L), (1L, 30L), (2L, 5L), (2L, 50L);

CREATE MATERIALIZED VIEW txtable.`${DIR}/mmmv` AS
SELECT g, COUNT(*) AS n_rows, SUM(v) AS v_sum, MIN(v) AS v_min,
       MAX(v) AS v_max, AVG(v) AS v_avg
FROM txtable.`${DIR}/mm` GROUP BY g;

DELETE FROM tx_parity_mm WHERE v = 50;

REFRESH MATERIALIZED VIEW txtable.`${DIR}/mmmv`;

SELECT g, n_rows, v_sum, v_min, v_max, v_avg FROM txtable.`${DIR}/mmmv`
ORDER BY g;

-- 50-53. STDDEV/VARIANCE + expression-SUM materialized view: the
--        moment backings (sum, sum-of-squares, non-null count) fold
--        under a delete like any SUM; sample semantics read NULL
--        below two rows; SUM over a scalar expression maintains the
--        same way
CREATE MATERIALIZED VIEW txtable.`${DIR}/momv` AS
SELECT g, COUNT(*) AS n_rows, STDDEV(v) AS v_stddev,
       VARIANCE(v) AS v_var, SUM(v * v) AS v_sq
FROM txtable.`${DIR}/mm` GROUP BY g;

DELETE FROM tx_parity_mm WHERE v = 30;

REFRESH MATERIALIZED VIEW txtable.`${DIR}/momv`;

SELECT g, n_rows, ROUND(v_var, 6) AS v_var, v_sq
FROM txtable.`${DIR}/momv` ORDER BY g;

-- 54-55. the TRANSPARENT rewrite: after a refresh the base aggregate
--        routes onto the view — same SQL, same answer, O(groups) plan
REFRESH MATERIALIZED VIEW txtable.`${DIR}/mmmv`;

SELECT g, COUNT(*) AS n_rows, SUM(v) AS v_sum
FROM txtable.`${DIR}/mm` GROUP BY g ORDER BY g;

-- 56. DROP MATERIALIZED VIEW retires the derived object (and only a
--     materialized view — a base table refuses)
DROP MATERIALIZED VIEW txtable.`${DIR}/momv`;

-- 57-61. COUNT(DISTINCT) materialized view (r17): maintained EXACTLY
--        under deletes via a hidden signed pair-count aux table —
--        deleting every occurrence of a value retires it from the
--        distinct count, while surviving duplicates still count once.
--        mm here holds {(1,10),(2,5)}; the INSERT makes
--        g=1:{10,10,7}, g=2:{5,5,9}
INSERT INTO tx_parity_mm VALUES (1L, 10L), (1L, 7L), (2L, 5L), (2L, 9L);

CREATE MATERIALIZED VIEW txtable.`${DIR}/dcmv` AS
SELECT g, COUNT(*) AS n_rows, COUNT(DISTINCT v) AS v_dcnt
FROM txtable.`${DIR}/mm` GROUP BY g;

DELETE FROM tx_parity_mm WHERE v = 10 OR v = 9;

REFRESH MATERIALIZED VIEW txtable.`${DIR}/dcmv`;

SELECT g, n_rows, v_dcnt FROM txtable.`${DIR}/dcmv` ORDER BY g;

-- 62-70. JOIN materialized view (r17): COUNT/SUM over an INNER
--        equi-join of two txtables, maintained through the delta-join
--        identity (ΔA⋈B₀ + A₁⋈ΔB) — the dim delete must subtract
--        every joined fact row its key ever matched, and the fact
--        delete must land in the same refresh window
CREATE TABLE tx_parity_jf (k BIGINT, qty BIGINT) USING txtable
  LOCATION '${DIR}/jf';

CREATE TABLE tx_parity_jd (k BIGINT, cat STRING) USING txtable
  LOCATION '${DIR}/jd';

INSERT INTO tx_parity_jf VALUES (1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L);

INSERT INTO tx_parity_jd VALUES (1L, 'a'), (2L, 'b'), (3L, 'a');

CREATE MATERIALIZED VIEW txtable.`${DIR}/jmv` AS
SELECT cat, COUNT(*) AS n_rows, SUM(qty) AS qty_sum
FROM txtable.`${DIR}/jf` f JOIN txtable.`${DIR}/jd` d ON f.k = d.k
GROUP BY cat;

DELETE FROM tx_parity_jd WHERE k = 3;

DELETE FROM tx_parity_jf WHERE qty = 20;

REFRESH MATERIALIZED VIEW txtable.`${DIR}/jmv`;

SELECT cat, n_rows, qty_sum FROM txtable.`${DIR}/jmv` ORDER BY cat;
