-- End-to-end transactional-table parity script: pure SQL, no Scala.
-- Run by graft.tools.ExtensionsCheck in a FRESH session configured
-- with spark.sql.extensions=graft.plans.GraftExtensions; ${DIR} is
-- substituted with a scratch directory holding a plain-parquet lake
-- at ${DIR}/lake (written by ordinary Spark, 6 rows: id 1-6, v=10*id).
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

-- 10. the full audit trail is queryable
DESCRIBE HISTORY txtable.`${DIR}/lake`;

-- 11. identity in CREATE TABLE column DDL (Delta's primary surface);
--     each INSERT's NULL slot means DEFAULT and the engine allocates
--     100, 101 — declared schema serves reads before any data lands
CREATE TABLE tx_parity_dim (uid BIGINT GENERATED ALWAYS AS IDENTITY
  (START WITH 100 INCREMENT BY 1), name STRING)
USING txtable LOCATION '${DIR}/dim';

INSERT INTO tx_parity_dim VALUES (CAST(NULL AS BIGINT), 'alpha');

INSERT INTO tx_parity_dim VALUES (CAST(NULL AS BIGINT), 'beta');

SELECT uid, name FROM tx_parity_dim ORDER BY uid;
