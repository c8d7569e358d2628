package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Reference pipeline semantics (SURVEY.md §2.A): a01–a52 — JDBC/wire
  * scans, type mapping, schema codegen, sync/merge/schedule, live wire legs.
  *
  * Split from the monolithic SparkEntry registry (round-12 hygiene);
  * keys and SQL are unchanged.
  */
object PipelineRegistry {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // pipeline operators (SURVEY §2.A), driven end-to-end
    "a01_jdbc_pushdown"     -> (PipelineQueries.a01JdbcPushdown _),
    "a02_jdbc_partitioned"  -> (PipelineQueries.a02JdbcPartitioned _),
    "a03_default_projection"-> (PipelineQueries.a03DefaultProjection _),
    "a04_catalog_scan"      -> (PipelineQueries.a04CatalogScan _),
    "a04b_mysql_catalog"    -> (PipelineQueries.a04bMysqlCatalog _),
    "a04c_mysql_quirks"     -> (PipelineQueries.a04cMysqlQuirks _),
    "a04d_pg_quirks"        -> (PipelineQueries.a04dPgQuirks _),
    "a04e_mssql_quirks"     -> (PipelineQueries.a04eMssqlQuirks _),
    "a05_type_mapping"      -> (PipelineQueries.a05TypeMapping _),
    "a06_schema_json"       -> (PipelineQueries.a06SchemaJson _),
    "a07_csv_roundtrip"     -> (PipelineQueries.a07CsvRoundtrip _),
    "a08_chunk_roundtrip"   -> (PipelineQueries.a08ChunkRoundtrip _),
    "a09_overwrite_snapshot"-> (PipelineQueries.a09OverwriteSnapshot _),
    "a10_merge_helper"      -> (PipelineQueries.a10MergeHelper _),
    "a11_sync_pipeline"     -> (PipelineQueries.a11SyncPipeline _),
    "a12_throttled_sync"    -> (PipelineQueries.a12ThrottledSync _),
    "a13_retry_sync"        -> (PipelineQueries.a13RetrySync _),
    "a14_schedule"          -> (PipelineQueries.a14Schedule _),
    "a15_run_date"          -> (PipelineQueries.a15RunDate _),
    "a16_scd2_merge"        -> (PipelineQueries.a16Scd2Merge _),
    "a17_incremental_sync"  -> (PipelineQueries.a17IncrementalSync _),
    "a18_bucketed_merge"    -> (PipelineQueries.a18BucketedMerge _),
    "a19_schema_evolution"  -> (PipelineQueries.a19SchemaEvolution _),
    "a20_partition_pruning" -> (PipelineQueries.a20PartitionPruning _),
    "a21_jdbc_publish"      -> (PipelineQueries.a21JdbcPublish _),
    "a22_cdc_merge"         -> (PipelineQueries.a22CdcMerge _),
    "a23_backfill"          -> (PipelineQueries.a23PartitionBackfill _),
    "a26_export_timeout"    -> (PipelineQueries.a26ExportTimeout _),
    "a30_incremental_dedup_sync" -> (PipelineQueries.a30IncrementalDedupSync _),
    "a31_scd2_lookup"       -> (PipelineQueries.a31Scd2Lookup _),
    "a32_schema_evolution"  -> (PipelineQueries.a32SchemaEvolution _),
    "a33_schema_conflict"   -> (PipelineQueries.a33SchemaConflict _),
    "a34_pgwire_pushdown"   -> (PipelineQueries.a34PgwirePushdown _),
    "a35_pgwire_partitioned" -> (PipelineQueries.a35PgwirePartitioned _),
    "a36_pgwire_catalog"    -> (PipelineQueries.a36PgwireCatalog _),
    "a45_mysqlwire_pushdown" -> (PipelineQueries.a45MysqlwirePushdown _),
    "a46_mysqlwire_partitioned" -> (PipelineQueries.a46MysqlwirePartitioned _),
    "a47_mysqlwire_quirks"  -> (PipelineQueries.a47MysqlwireQuirks _),
    "a48_kafka_roundtrip"   -> (PipelineQueries.a48KafkaRoundtrip _),
    "a60_tdswire_tls"       -> (PipelineQueries.a60TdswireTls _),
    "a62_time_travel"       -> (PipelineQueries.a62TimeTravel _),
    "stream_tumbling_publish" -> (PipelineQueries.streamTumblingPublish _),
    "stream_session_publish"  -> (PipelineQueries.streamSessionPublish _),
    "a68_deletion_vectors"    -> (PipelineQueries.a68DeletionVectors _),
    "a66_concurrent_publish" -> (PipelineQueries.a66ConcurrentPublish _),
    "a67_time_travel_evolution" -> (PipelineQueries.a67TimeTravelEvolution _),
    "a63_dialect_parity"    -> (PipelineQueries.a63DialectParity _),
    "a64_protobuf_roundtrip" -> (PipelineQueries.a64ProtobufRoundtrip _),
    "a65_cbor_roundtrip"    -> (PipelineQueries.a65CborRoundtrip _),
    "a61_kafkawire_tls"     -> (PipelineQueries.a61KafkawireTls _),
    "a49_gzip_jsonl"        -> (PipelineQueries.a49GzipJsonl _),
    "a57_zstd_parquet"      -> (PipelineQueries.a57ZstdParquet _),
    "a58_dialect_sniff"     -> (PipelineQueries.a58DialectSniff _),
    "a59_encrypted_export"  -> (PipelineQueries.a59EncryptedExport _),
    "a53_avro_roundtrip"    -> (PipelineQueries.a53AvroRoundtrip _),
    "a54_xml_roundtrip"     -> (PipelineQueries.a54XmlRoundtrip _),
    "a55_fixed_width"       -> (PipelineQueries.a55FixedWidthRoundtrip _),
    "a56_csv_multiline"     -> (PipelineQueries.a56CsvMultiline _),
    "a50_pgwire_tls"        -> (PipelineQueries.a50PgwireTls _),
    "a51_mssqlwire_pushdown" -> (PipelineQueries.a51MssqlwirePushdown _),
    "a51b_mssqlwire_quirks" -> (PipelineQueries.a51bMssqlwireQuirks _),
    "a52_mysqlwire_tls"     -> (PipelineQueries.a52MysqlwireTls _),
    "a37_bus_roundtrip"     -> (PipelineQueries.a37BusRoundtrip _),
    "a38_bus_sync"          -> (PipelineQueries.a38BusSync _),
    "a39_snapshot_diff"     -> (PipelineQueries.a39SnapshotDiff _),
    "a40_gdpr_delete"       -> (PipelineQueries.a40GdprDelete _),
    "a41_atomic_publish"    -> (PipelineQueries.a41AtomicMultiPublish _),
    "a42_retention_vacuum"  -> (PipelineQueries.a42RetentionVacuum _),
    "a43_late_arriving"     -> (PipelineQueries.a43LateArriving _),
    "a44_write_audit_publish" -> (PipelineQueries.a44WriteAuditPublish _),
    // LLM-data-pipeline operators (north-star extensions)
    "asof_join"             -> (LlmQueries.asofJoin _),
    "asof_nearest"          -> (LlmQueries.asofNearest _),
    "asof_tolerance"        -> (LlmQueries.asofTolerance _),
    "asof_join_native"      -> (LlmQueries.asofJoinNative _),
    "a27_orc_roundtrip"     -> (PipelineQueries.a27OrcRoundtrip _),
    "a28_jsonl_roundtrip"   -> (PipelineQueries.a28JsonlRoundtrip _),
    "a29_corrupt_records"   -> (PipelineQueries.a29CorruptRecords _),
    "a24_compaction"        -> (PipelineQueries.a24Compaction _),
    "a25_manifest"          -> (PipelineQueries.a25Manifest _),
  )

  def oracleSql: Map[String, String] = Map(
    // --- pipeline operators (A*): round-trip/merge outputs the oracle
    // reproduces straight from the source tables ---
    "a01_jdbc_pushdown" ->
      """SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS bal FROM customer
        |WHERE c_acctbal > 5000 ORDER BY c_custkey""".stripMargin,
    "a02_jdbc_partitioned" ->
      """SELECT c_nationkey, COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS bal
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "a03_default_projection" ->
      "SELECT * FROM region ORDER BY r_regionkey",
    "a12_throttled_sync" ->
      """SELECT * FROM (
        |  SELECT 'customer' AS table_name, COUNT(*) AS n_rows FROM customer
        |  UNION ALL SELECT 'nation', COUNT(*) FROM nation
        |  UNION ALL SELECT 'region', COUNT(*) FROM region
        |) AS t ORDER BY table_name""".stripMargin,
    "a13_retry_sync" ->
      "SELECT * FROM region ORDER BY r_regionkey",
    // timed-out first attempt + successful retry publish the same snapshot
    // a healthy run would
    "a26_export_timeout" ->
      "SELECT * FROM region ORDER BY r_regionkey",
    "a14_schedule" ->
      """SELECT * FROM (VALUES
        |  ('2020-03-07T05:30', '2020-03-07T06:00', '2020-03-06'),
        |  ('2020-03-07T06:00', '2020-03-08T06:00', '2020-03-07'),
        |  ('2020-03-07T23:59', '2020-03-08T06:00', '2020-03-07')
        |) AS t(probe, next_fire, data_date) ORDER BY probe""".stripMargin,
    "a04_catalog_scan" ->
      """SELECT * FROM (VALUES
        |  ('c_custkey', 'BIGINT', 'INTEGER', CAST(1 AS BIGINT)),
        |  ('c_name', 'CLOB(2147483647)', 'STRING', 2),
        |  ('c_nationkey', 'INTEGER', 'INTEGER', 3),
        |  ('c_acctbal', 'DOUBLE', 'FLOAT', 4),
        |  ('c_mktsegment', 'CLOB(2147483647)', 'STRING', 5)
        |) AS t(col_name, data_type, bq_type, pos) ORDER BY pos""".stripMargin,
    // the MySQL-shaped catalog path: expected output of the reference's
    // literal INFORMATION_SCHEMA query + type map over the appdb.accounts
    // fixture (decoy schema/table rows must NOT appear)
    "a04b_mysql_catalog" ->
      """SELECT * FROM (VALUES
        |  ('id', 'bigint', 'INTEGER', CAST(1 AS BIGINT)),
        |  ('flags', 'tinyint', 'INTEGER', 2),
        |  ('region_id', 'mediumint', 'INTEGER', 3),
        |  ('balance', 'decimal', 'FLOAT', 4),
        |  ('ratio', 'double', 'FLOAT', 5),
        |  ('score', 'float', 'FLOAT', 6),
        |  ('created_at', 'datetime', 'DATETIME', 7),
        |  ('birth_date', 'date', 'DATE', 8),
        |  ('updated_at', 'timestamp', 'DATETIME', 9),
        |  ('bio', 'text', 'STRING', 10),
        |  ('name', 'varchar', 'STRING', 11),
        |  ('location', 'point', 'INTEGER', 12),
        |  ('prefs', 'json', 'STRING', 13),
        |  ('last_login', 'datetime', 'DATETIME', 14)
        |) AS t(col_name, data_type, bq_type, pos) ORDER BY pos""".stripMargin,
    // Dialect-quirk contract pinned as a literal truth table: zero-date →
    // NULL (CONVERT_TO_NULL), unsigned BIGINT max survives via
    // DECIMAL(20,0), tinyint(1) stays the reference-faithful INTEGER.
    "a04c_mysql_quirks" ->
      """SELECT * FROM (VALUES
        |  ('big_id', 'bigint unsigned', 'INTEGER', 'decimal(20,0)', '18446744073709551615'),
        |  ('born', 'datetime', 'DATETIME', 'timestamp_ntz', NULL),
        |  ('is_active', 'tinyint(1)', 'INTEGER', 'bigint', '1'),
        |  ('price', 'decimal(10,2) unsigned', 'FLOAT', 'double', '999.99'),
        |  ('small_id', 'bigint unsigned', 'INTEGER', 'decimal(20,0)', '42'),
        |  ('updated', 'datetime', 'DATETIME', 'timestamp_ntz', '2024-05-01 10:30:00')
        |) AS t(col_name, raw_type, bq_type, spark_type, parsed)
        |ORDER BY col_name""".stripMargin,
    // The Postgres sibling truth table: serial/boolean/numeric names fall
    // through the MySQL-tuned reference map to STRING (faithful), the
    // engine keeps native types; timestamptz normalizes to the UTC
    // instant; infinity sentinels → NULL; numeric-without-scale survives
    // at DECIMAL(38,9) under the fidelity flag.
    "a04d_pg_quirks" ->
      """SELECT * FROM (VALUES
        |  ('balance', 'numeric', 'STRING', 'decimal(38,9)', '12345678901234567890.123456789'),
        |  ('big_id', 'bigserial', 'STRING', 'bigint', '9223372036854775807'),
        |  ('created_at', 'timestamp with time zone', 'DATETIME', 'timestamp', '2024-05-01 08:30:00'),
        |  ('expires_at', 'timestamptz', 'DATETIME', 'timestamp', NULL),
        |  ('id', 'serial', 'STRING', 'bigint', '2147483647'),
        |  ('is_active', 'boolean', 'STRING', 'boolean', 'true'),
        |  ('is_deleted', 'boolean', 'STRING', 'boolean', 'false'),
        |  ('seq_no', 'integer', 'INTEGER', 'bigint', '2147483647'),
        |  ('sid', 'smallserial', 'STRING', 'bigint', '32767')
        |) AS t(col_name, raw_type, bq_type, spark_type, parsed)
        |ORDER BY col_name""".stripMargin,
    // The SQL Server sibling truth table: bit/money/uniqueidentifier fall
    // through the substring map to STRING (faithful — "BIT" contains no
    // "INT"), engine keeps boolean/exact-decimal; datetime2's 7th
    // fractional digit truncates at engine microseconds; datetimeoffset
    // normalizes to the UTC instant; tinyint is unsigned, 255 survives.
    "a04e_mssql_quirks" ->
      """SELECT * FROM (VALUES
        |  ('balance', 'money', 'STRING', 'decimal(19,4)', '922337203685477.5807'),
        |  ('created_at', 'datetime2', 'DATETIME', 'timestamp_ntz', '2024-05-01 10:30:00.123456'),
        |  ('event_at', 'datetimeoffset', 'DATETIME', 'timestamp', '2024-05-01 08:30:00'),
        |  ('flag_off', 'bit', 'STRING', 'boolean', 'false'),
        |  ('is_active', 'bit', 'STRING', 'boolean', 'true'),
        |  ('modified_at', 'smalldatetime', 'DATETIME', 'timestamp_ntz', '2024-05-01 10:30:00'),
        |  ('qty', 'tinyint', 'INTEGER', 'bigint', '255'),
        |  ('row_guid', 'uniqueidentifier', 'STRING', 'string', '6f9619ff-8b86-d011-b42d-00c04fc964ff'),
        |  ('tip', 'smallmoney', 'STRING', 'decimal(10,4)', '214748.3647'),
        |  ('title', 'nvarchar(100)', 'STRING', 'string', 'naïve café')
        |) AS t(col_name, raw_type, bq_type, spark_type, parsed)
        |ORDER BY col_name""".stripMargin,
    "a05_type_mapping" ->
      """SELECT * FROM (VALUES
        |  ('balance', 'decimal', 'balance', 'FLOAT', 'double'),
        |  ('born', 'datetime', 'born', 'DATETIME', 'timestamp_ntz'),
        |  ('either/or', 'varchar', 'either_and_or', 'STRING', 'string'),
        |  ('full name', 'varchar', 'full_name', 'STRING', 'string'),
        |  ('id', 'int', 'id', 'INTEGER', 'bigint'),
        |  ('note', 'text', 'note', 'STRING', 'string'),
        |  ('pt', 'point', 'pt', 'INTEGER', 'bigint'),
        |  ('ratio', 'double', 'ratio', 'FLOAT', 'double'),
        |  ('start_date', 'date', 'start_date', 'DATE', 'date'),
        |  ('ts_col', 'timestamp', 'ts_col', 'DATETIME', 'timestamp_ntz')
        |) AS t(raw_name, raw_type, col_name, bq_type, spark_type)
        |ORDER BY raw_name""".stripMargin,
    "a06_schema_json" ->
      """SELECT '[{"name": "id", "type": "INTEGER", "mode": "NULLABLE"}, {"name": "full_name", "type": "STRING", "mode": "NULLABLE"}, {"name": "either_and_or", "type": "STRING", "mode": "NULLABLE"}, {"name": "born", "type": "DATETIME", "mode": "NULLABLE"}, {"name": "start_date", "type": "DATE", "mode": "NULLABLE"}, {"name": "balance", "type": "FLOAT", "mode": "NULLABLE"}, {"name": "ratio", "type": "FLOAT", "mode": "NULLABLE"}, {"name": "note", "type": "STRING", "mode": "NULLABLE"}, {"name": "ts_col", "type": "DATETIME", "mode": "NULLABLE"}, {"name": "pt", "type": "INTEGER", "mode": "NULLABLE"}]' AS schema_json""".stripMargin,
    "a07_csv_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin,
    "a08_chunk_roundtrip" ->
      """SELECT c_nationkey, COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS bal
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "a09_overwrite_snapshot" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "a10_merge_helper" ->
      """WITH existing AS (SELECT o_orderkey, o_orderstatus AS st,
        |       ROUND(o_totalprice + 1000, 2) AS p FROM orders WHERE o_orderkey % 2 = 0),
        |     stage AS (SELECT o_orderkey, o_orderstatus AS st,
        |       ROUND(o_totalprice, 2) AS p FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT COALESCE(s.o_orderkey, e.o_orderkey) AS k,
        |       COALESCE(s.st, e.st) AS st, COALESCE(s.p, e.p) AS p
        |FROM existing e FULL OUTER JOIN stage s ON e.o_orderkey = s.o_orderkey
        |ORDER BY k""".stripMargin,
    "a11_sync_pipeline" ->
      """WITH existing AS (SELECT o_orderkey, o_orderstatus,
        |       ROUND(o_totalprice + 1000, 2) AS p FROM orders WHERE o_orderkey % 2 = 0),
        |     stage AS (SELECT o_orderkey, o_orderstatus,
        |       ROUND(o_totalprice, 2) AS p FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT COALESCE(s.o_orderkey, e.o_orderkey) AS o_orderkey,
        |       COALESCE(s.o_orderstatus, e.o_orderstatus) AS o_orderstatus,
        |       COALESCE(s.p, e.p) AS p
        |FROM existing e FULL OUTER JOIN stage s ON e.o_orderkey = s.o_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    "a15_run_date" ->
      """SELECT DISTINCT strftime(o_orderdate, '%Y%m%d') AS ds FROM orders
        |ORDER BY ds LIMIT 100""".stripMargin,
    // --- LLM-pipeline operators: ground-truth oracles (near-dup corpora
    // constructed identically; the oracle computes all-pairs truth, so the
    // engine's bucketed path is checked for RECALL, not just consistency) ---
    "asof_join" ->
      """SELECT c.event_id, c.user_id, p.event_id AS p_id,
        |       ROUND(p.value, 2) AS p_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,
    "asof_join_native" ->
      """SELECT c.event_id, c.user_id, p.event_id AS p_id,
        |       ROUND(p.value, 2) AS p_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,
    // Unbounded ASOF match CASE-nulled at the same 1 h cutoff: the as-of
    // match is the LATEST preceding row, so out-of-window implies no row
    // is in-window — the conditional IS the tolerance semantics.
    // DuckDB has no NEAREST direction: the oracle takes the definitional
    // per-row LATERAL argmin over |dist| with the (dist, earlier-ts,
    // greatest-payload) tie order the engine guarantees by construction
    "asof_nearest" ->
      """WITH c AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |p0 AS (
        |  SELECT user_id, ts, event_id AS p_id, ROUND(value, 2) AS p_value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |      ORDER BY event_id DESC, p_value DESC) AS rn
        |  FROM events WHERE event_type = 'purchase'),
        |p AS (SELECT user_id, ts, p_id, p_value FROM p0 WHERE rn = 1)
        |SELECT c.event_id, c.user_id, n.p_id, n.p_value
        |FROM c LEFT JOIN LATERAL (
        |  SELECT p.p_id, p.p_value FROM p
        |  WHERE p.user_id = c.user_id
        |  ORDER BY ABS(epoch_us(p.ts) - epoch_us(c.ts)), p.ts
        |  LIMIT 1) n ON TRUE
        |ORDER BY c.event_id""".stripMargin,
    "asof_tolerance" ->
      """SELECT c.event_id, c.user_id,
        |  CASE WHEN p.ts >= c.ts - INTERVAL 1 HOUR THEN p.event_id END AS p_id,
        |  CASE WHEN p.ts >= c.ts - INTERVAL 1 HOUR THEN ROUND(p.value, 2) END AS p_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,
    "a16_scd2_merge" ->
      """WITH c AS (
        |  SELECT c_custkey AS key, ROUND(c_acctbal, 2) AS bal, c_mktsegment AS seg
        |  FROM customer),
        |cur AS (
        |  SELECT key, bal, seg, '2024-01-01' AS valid_from,
        |         CAST(NULL AS VARCHAR) AS valid_to, 1 AS is_current
        |  FROM c WHERE key <= 1200),
        |closed AS (
        |  SELECT key, ROUND(bal - 50, 2) AS bal, seg, '2023-01-01' AS valid_from,
        |         '2024-01-01' AS valid_to, 0 AS is_current
        |  FROM c WHERE key <= 1200 AND key % 100 = 0),
        |stage AS (
        |  SELECT key,
        |         CASE WHEN key % 3 = 0 THEN ROUND(bal + 100, 2) ELSE bal END AS bal,
        |         seg
        |  FROM c WHERE key > 100),
        |j AS (
        |  SELECT e.key AS ekey, e.bal AS ebal, e.seg AS eseg,
        |         e.valid_from AS evf, e.valid_to AS evt,
        |         s.key AS skey, s.bal AS sbal, s.seg AS sseg
        |  FROM cur e FULL OUTER JOIN stage s ON e.key = s.key),
        |kept AS (
        |  SELECT ekey AS key, ebal AS bal, eseg AS seg, evf AS valid_from,
        |    CASE WHEN skey IS NOT NULL
        |              AND (ebal IS DISTINCT FROM sbal OR eseg IS DISTINCT FROM sseg)
        |         THEN '2024-06-01' ELSE evt END AS valid_to,
        |    CASE WHEN skey IS NOT NULL
        |              AND (ebal IS DISTINCT FROM sbal OR eseg IS DISTINCT FROM sseg)
        |         THEN 0 ELSE 1 END AS is_current
        |  FROM j WHERE ekey IS NOT NULL),
        |opened AS (
        |  SELECT skey AS key, sbal AS bal, sseg AS seg, '2024-06-01' AS valid_from,
        |         CAST(NULL AS VARCHAR) AS valid_to, 1 AS is_current
        |  FROM j WHERE ekey IS NULL
        |     OR (skey IS NOT NULL
        |         AND (ebal IS DISTINCT FROM sbal OR eseg IS DISTINCT FROM sseg)))
        |SELECT * FROM closed
        |UNION ALL SELECT * FROM kept
        |UNION ALL SELECT * FROM opened
        |ORDER BY key, valid_from, is_current""".stripMargin,
    // layout-invariant: the day aggregate from the raw (unpartitioned) table
    "a20_partition_pruning" ->
      """SELECT event_type, COUNT(*) AS c, ROUND(SUM(value), 2) AS v
        |FROM events
        |WHERE CAST(ts AS DATE) = DATE '2024-01-02'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a21_jdbc_publish" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(SUM(o_totalprice), 2) AS rev
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "a23_backfill" ->
      """SELECT CAST(ts AS DATE) AS event_date,
        |  CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS v
        |FROM events GROUP BY 1 ORDER BY event_date""".stripMargin,
    "a22_cdc_merge" ->
      """WITH e AS (SELECT o_orderkey AS k, o_orderstatus AS st,
        |             ROUND(o_totalprice, 2) AS p
        |           FROM orders WHERE o_orderkey % 2 = 0),
        |c AS (SELECT o_orderkey AS k, o_orderstatus AS st,
        |        ROUND(o_totalprice + 10, 2) AS p,
        |        CASE WHEN o_orderkey % 3 = 0 THEN 'D' ELSE 'U' END AS op
        |      FROM orders WHERE o_orderkey % 3 <> 2)
        |SELECT CASE WHEN c.op IS NOT NULL THEN c.k ELSE e.k END AS k,
        |  CASE WHEN c.op IS NOT NULL THEN c.st ELSE e.st END AS st,
        |  CASE WHEN c.op IS NOT NULL THEN c.p ELSE e.p END AS p
        |FROM e FULL OUTER JOIN c ON e.k = c.k
        |WHERE c.op IS NULL OR c.op <> 'D'
        |ORDER BY k""".stripMargin,
    // rows that predate the new `pri` column carry NULL for it
    "a19_schema_evolution" ->
      """SELECT COALESCE(s.o_orderkey, e.o_orderkey) AS k,
        |       COALESCE(s.st, e.st) AS st, COALESCE(s.p, e.p) AS p,
        |       s.pri AS pri
        |FROM (SELECT o_orderkey, o_orderstatus AS st, ROUND(o_totalprice + 1000, 2) AS p
        |      FROM orders WHERE o_orderkey % 2 = 0) e
        |FULL OUTER JOIN
        |     (SELECT o_orderkey, o_orderstatus AS st, ROUND(o_totalprice, 2) AS p,
        |             o_orderpriority AS pri
        |      FROM orders WHERE o_orderkey % 3 = 0) s
        |  ON e.o_orderkey = s.o_orderkey
        |ORDER BY k""".stripMargin,
    // same merge semantics as a10 — bucketed-layout execution, identical result
    "a18_bucketed_merge" ->
      """SELECT COALESCE(s.o_orderkey, e.o_orderkey) AS k,
        |       COALESCE(s.st, e.st) AS st, COALESCE(s.p, e.p) AS p
        |FROM (SELECT o_orderkey, o_orderstatus AS st, ROUND(o_totalprice + 1000, 2) AS p
        |      FROM orders WHERE o_orderkey % 2 = 0) e
        |FULL OUTER JOIN
        |     (SELECT o_orderkey, o_orderstatus AS st, ROUND(o_totalprice, 2) AS p
        |      FROM orders WHERE o_orderkey % 3 = 0) s
        |  ON e.o_orderkey = s.o_orderkey
        |ORDER BY k""".stripMargin,
    "a27_orc_roundtrip" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(SUM(o_totalprice), 2) AS rev,
        |  CAST(COUNT(o_orderpriority) AS BIGINT) AS n_prio,
        |  CAST(MIN(o_orderdate) AS DATE) AS min_date
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // 7 malformed lines injected by construction; good-row count and the
    // content aggregate recompute from the original table.
    "a29_corrupt_records" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_good,
        |  CAST(7 AS BIGINT) AS n_corrupt,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents""".stripMargin,
    // a49: the same content truth through the gzip-compressed leg — the
    // decompression path must be byte-lossless to match
    "a49_gzip_jsonl" ->
      """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS BIGINT)
        |    AS content_xor
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    // a57: the same content truth through the zstd parquet leg — the
    // codec must be lossless and the readback exact
    "a57_zstd_parquet" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS sum_cents
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // a58: the same content truth through the sniffed-dialect parse --
    // detection must land on ';' or the readback hash diverges
    "a58_dialect_sniff" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(bit_xor(('0x' || substr(md5('a,"b"|c' || chr(9) || text),
        |    1, 15))::BIGINT) AS BIGINT) AS content_xor
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // a59: the same content truth through the AES-GCM seal/unseal leg;
    // every appended-byte tamper must fail the tag -> rejected == n
    "a59_encrypted_export" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS BIGINT)
        |    AS content_xor,
        |  CAST(COUNT(*) AS BIGINT) AS n_tamper_rejected
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // a53: same content truth through the Avro container leg — zigzag
    // varints, UTF-8 runs, deflate blocks and sync markers must all be
    // byte-lossless for every group hash to match
    "a64_protobuf_roundtrip" ->
      """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS BIGINT)
        |    AS content_xor
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "a65_cbor_roundtrip" ->
      """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS BIGINT)
        |    AS content_xor
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "a53_avro_roundtrip" ->
      """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS BIGINT)
        |    AS content_xor
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    // a54: same content truth through the XML leg — entity escaping and
    // whitespace handling must be byte-lossless
    "a54_xml_roundtrip" ->
      """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS BIGINT)
        |    AS content_xor
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    // a56: group hashes recomputed from the ORIGINAL table with the
    // SAME comma/quote/newline decoration — any dialect mutation flips
    "a56_csv_multiline" ->
      """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(bit_xor(('0x' || substr(md5(
        |      text || ', "mid"' || chr(10) || 'tail-'
        |        || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) AS BIGINT)
        |    AS content_xor
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    // a55: recomputed from the ORIGINAL orders table — any fixed-width
    // offset/pad/parse error flips a group checksum
    "a55_fixed_width" ->
      """SELECT o_orderstatus AS status, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS total_cents,
        |  CAST(bit_xor(('0x' || substr(md5(CAST(o_orderkey AS STRING)), 1, 15))::BIGINT)
        |    AS BIGINT) AS key_xor,
        |  CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
        |  MAX(CAST(o_orderdate AS DATE)) AS max_date
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // Recomputed from the ORIGINAL parquet — any JSON escape/unescape
    // mutation of any text flips the group's XOR-folded portable hash.
    "a28_jsonl_roundtrip" ->
      """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS BIGINT)
        |    AS content_xor
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "a25_manifest" ->
      """SELECT 'customer' AS table_name,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_name,
        |  CAST(bit_xor(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT)
        |    AS BIGINT) AS key_checksum
        |FROM customer""".stripMargin,
    "a24_compaction" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(SUM(o_totalprice), 2) AS rev
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // Additive evolution replayed: day-1 keys carry NULL in the column
    // the source gained on day 2; the regenerated schema doc is the A5/A6
    // map over the evolved catalog.
    "a32_schema_evolution" ->
      """SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey > 2000 THEN c_mktsegment END AS c_mktsegment,
        |  '[{"name": "c_custkey", "type": "INTEGER", "mode": "NULLABLE"}, {"name": "c_name", "type": "STRING", "mode": "NULLABLE"}, {"name": "c_mktsegment", "type": "STRING", "mode": "NULLABLE"}]'
        |    AS schema_json
        |FROM customer WHERE c_custkey <= 4000
        |ORDER BY c_custkey""".stripMargin,
    // The refusal-side truth table: verdicts from the reference's 5-type
    // warehouse system; two non-STRING label changes are incompatible
    // (loud refusal), STRING relaxation is the "fix it later" widening.
    "a33_schema_conflict" ->
      """SELECT * FROM (VALUES
        |  ('balance', 'FLOAT', 'INTEGER', 'incompatible', false),
        |  ('born', 'DATETIME', 'STRING', 'widened', false),
        |  ('email', '', 'STRING', 'added', false),
        |  ('id', 'INTEGER', 'INTEGER', 'unchanged', false),
        |  ('legacy_code', 'INTEGER', '', 'removed', false),
        |  ('name', 'STRING', 'STRING', 'unchanged', false),
        |  ('ratio', 'FLOAT', 'FLOAT', 'unchanged', false),
        |  ('start_date', 'DATE', 'DATETIME', 'incompatible', false)
        |) AS t(col_name, old_type, new_type, verdict, table_compatible)
        |ORDER BY col_name""".stripMargin,
    // a34-a36: the A1/A2/A4 scans through the live PostgreSQL-wire
    // listener; the data is bit-identical to the embedded legs (same
    // customer rows loaded THROUGH the socket), so the oracles are the
    // plain-parquet truths.
    "a34_pgwire_pushdown" ->
      """SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS bal FROM customer
        |WHERE c_acctbal > 5000 ORDER BY c_custkey""".stripMargin,
    "a35_pgwire_partitioned" ->
      """SELECT c_nationkey, COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS bal
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    // catalog truth for the wire-created table: VARCHAR columns (the
    // embedded a04 table stores strings as CLOB via Spark's Derby
    // dialect; the wire DDL declares VARCHAR explicitly)
    "a36_pgwire_catalog" ->
      """SELECT * FROM (VALUES
        |  ('c_custkey', 'BIGINT', 'INTEGER', CAST(1 AS BIGINT)),
        |  ('c_name', 'VARCHAR(64)', 'STRING', 2),
        |  ('c_nationkey', 'INTEGER', 'INTEGER', 3),
        |  ('c_acctbal', 'DOUBLE', 'FLOAT', 4),
        |  ('c_mktsegment', 'VARCHAR(16)', 'STRING', 5)
        |) AS t(col_name, data_type, bq_type, pos) ORDER BY pos""".stripMargin,
    // a45-a47: the same scans through the live MYSQL-wire listener (the
    // reference's primary source protocol); data is loaded THROUGH the
    // socket, so the oracles are the plain-parquet truths again.
    "a45_mysqlwire_pushdown" ->
      """SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS bal FROM customer
        |WHERE c_acctbal > 5000 ORDER BY c_custkey""".stripMargin,
    "a46_mysqlwire_partitioned" ->
      """SELECT c_nationkey, COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS bal
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    // a50/a52: the pushdown scan with EVERY byte (DDL, batched load,
    // WHERE, streamed rows) inside the TLS-upgraded wire session — the
    // data is still bit-identical to the plain-parquet truth; only the
    // transport changed, and a handshake/framing mistake loses rows.
    "a50_pgwire_tls" ->
      """SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS bal FROM customer
        |WHERE c_acctbal > 5000 ORDER BY c_custkey""".stripMargin,
    // a51/a51b: the pushdown scan and the MSSQL value quirks through the
    // live TDS socket (three-part [db].[dbo].[table] naming, binary-typed
    // row tokens) — data loaded THROUGH the socket, truths recomputed
    // from parquet / literal fixtures.
    "a51_mssqlwire_pushdown" ->
      """SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS bal FROM customer
        |WHERE c_acctbal > 5000 ORDER BY c_custkey""".stripMargin,
    "a51b_mssqlwire_quirks" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 1, '922337203685477.5807', '214748.3647',
        |   '2024-05-01 10:30:00.123456', 'naïve café', 255),
        |  (2, 0, '-0.0001', NULL, '1999-12-31 23:59:59', NULL, -7),
        |  (3, NULL, NULL, '0.5000', NULL, 'plain', NULL)
        |) AS t(id, active_int, balance_str, tip_str, created_str, title,
        |       qty) ORDER BY id""".stripMargin,
    "a52_mysqlwire_tls" ->
      """SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS bal FROM customer
        |WHERE c_acctbal > 5000 ORDER BY c_custkey""".stripMargin,
    // a60: the a51 scan inside TLS (MS-TDS framed handshake, then raw
    // records) — same parquet truth, encrypted transport
    "a60_tdswire_tls" ->
      """SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS bal FROM customer
        |WHERE c_acctbal > 5000 ORDER BY c_custkey""".stripMargin,
    // §2.C batch-equivalence: the streaming tumbling-window publish
    // (AvailableNow drain → per-batch deltas → idempotent additive
    // merge → atomic publish) must equal batch Q20 — the oracle IS
    // Q20's SQL
    "stream_tumbling_publish" ->
      """SELECT user_id, date_trunc('hour', ts) AS w,
        |  COUNT(*) AS c, ROUND(SUM(value), 2) AS v
        |FROM events GROUP BY user_id, date_trunc('hour', ts)
        |ORDER BY user_id, w""".stripMargin,
    // a68: two O(deleted) sidecar batches then a compaction — the three
    // tagged reads are the filtered truths (mor_v2 ≡ compacted: the
    // rewrite changes bytes, never answers); the physical no-base-
    // rewrite / sidecar-count contract is require()d in-row
    "a68_deletion_vectors" ->
      """WITH m1 AS (SELECT * FROM orders WHERE o_orderkey % 97 <> 0),
        |m2 AS (SELECT * FROM m1 WHERE o_orderkey % 101 <> 0)
        |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(SUM(o_totalprice), 2) AS rev, 'compacted' AS read_as
        |FROM m2 GROUP BY 1
        |UNION ALL
        |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(SUM(o_totalprice), 2) AS rev, 'mor_v1' AS read_as
        |FROM m1 GROUP BY 1
        |UNION ALL
        |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(SUM(o_totalprice), 2) AS rev, 'mor_v2' AS read_as
        |FROM m2 GROUP BY 1
        |ORDER BY read_as, o_orderstatus""".stripMargin,
    // stream_session: gap sessions at session_window's MICROSECOND
    // semantics (break at diff >= gap — not q27's floored-second
    // spelling), closed-session filter = the watermark contract
    // (session_end <= max_ts - 1s delay; sessions still open when the
    // source drains have no final row, in the engine or here)
    "stream_session_publish" ->
      """WITH e AS (SELECT user_id, ts, value, event_id,
        |    epoch_us(ts) AS t FROM events),
        |mx AS (SELECT MAX(t) AS mt FROM e),
        |b AS (SELECT user_id, ts, value, t, event_id,
        |    CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
        |           IS NULL
        |         OR t - lag(t) OVER (PARTITION BY user_id
        |           ORDER BY t, event_id) >= 1800000000
        |    THEN 1 ELSE 0 END AS brk FROM e),
        |sq AS (SELECT user_id, ts, value,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
        |      ROWS UNBOUNDED PRECEDING) AS seq
        |  FROM b),
        |sess AS (SELECT user_id, seq, MIN(ts) AS w_start,
        |    MAX(ts) + INTERVAL 30 MINUTE AS w_end,
        |    CAST(COUNT(*) AS BIGINT) AS n_events,
        |    ROUND(SUM(value), 2) AS v
        |  FROM sq GROUP BY 1, 2)
        |SELECT user_id, w_start, w_end, n_events, v
        |FROM sess, mx WHERE epoch_us(w_end) <= mx.mt - 1000000
        |ORDER BY user_id, w_start""".stripMargin,
    // a62: the manifest-history time-travel contract — four reads of
    // the twice-published dataset: version 1, version 2, as-of a date
    // between the two publish stamps (= version 1), and live (= v2)
    "a62_time_travel" ->
      """WITH full_agg AS (
        |  SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
        |  FROM nation GROUP BY n_regionkey),
        |even_agg AS (
        |  SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
        |  FROM nation WHERE n_nationkey % 2 = 0 GROUP BY n_regionkey)
        |SELECT n_regionkey, n, key_sum, 'v1' AS read_as FROM full_agg
        |UNION ALL
        |SELECT n_regionkey, n, key_sum, 'v2' AS read_as FROM even_agg
        |UNION ALL
        |SELECT n_regionkey, n, key_sum, 'asof_1500' AS read_as FROM full_agg
        |UNION ALL
        |SELECT n_regionkey, n, key_sum, 'live' AS read_as FROM even_agg
        |ORDER BY read_as, n_regionkey""".stripMargin,
    // a66: the optimistic-concurrency contract — winner's even-keys
    // aggregate at v2, the refused odd-keys publish retried at v3 (and
    // live), exactly ONE observed refusal; a silent clobber or a lost
    // version changes the tagged row set
    "a66_concurrent_publish" ->
      """WITH full_agg AS (
        |  SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
        |  FROM nation GROUP BY n_regionkey),
        |even_agg AS (
        |  SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
        |  FROM nation WHERE n_nationkey % 2 = 0 GROUP BY n_regionkey),
        |odd_agg AS (
        |  SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
        |  FROM nation WHERE n_nationkey % 2 = 1 GROUP BY n_regionkey)
        |SELECT n_regionkey, n, key_sum, 'v1_base' AS read_as,
        |  CAST(1 AS BIGINT) AS n_refused FROM full_agg
        |UNION ALL SELECT n_regionkey, n, key_sum, 'v2_winner', 1
        |FROM even_agg
        |UNION ALL SELECT n_regionkey, n, key_sum, 'v3_retried', 1
        |FROM odd_agg
        |UNION ALL SELECT n_regionkey, n, key_sum, 'live', 1 FROM odd_agg
        |ORDER BY read_as, n_regionkey""".stripMargin,
    // a67: time travel across a schema evolution — each version reads
    // back with ITS OWN schema (v1 has only n; v2 renamed it to cnt and
    // added key_sum), pinned via the per-version column list
    "a67_time_travel_evolution" ->
      """WITH b AS (
        |  SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS c,
        |    CAST(SUM(n_nationkey) AS BIGINT) AS ks
        |  FROM nation GROUP BY n_regionkey)
        |SELECT n_regionkey, c AS n, CAST(NULL AS BIGINT) AS cnt,
        |  CAST(NULL AS BIGINT) AS key_sum, 'v1' AS read_as,
        |  'n,n_regionkey' AS cols FROM b
        |UNION ALL
        |SELECT n_regionkey, CAST(NULL AS BIGINT), c, ks, 'v2',
        |  'cnt,key_sum,n_regionkey' FROM b
        |ORDER BY read_as, n_regionkey""".stripMargin,
    // a63: one decimal/temporal fixture through all three live wire
    // dialects -- the same literal block three times; a codec divergence
    // in any leg breaks exactly its tagged rows
    "a63_dialect_parity" ->
      """WITH f(id, money_str, tip_str, ts_str, d_str, title, sm) AS (VALUES
        |  (CAST(1 AS BIGINT), '922337203685477.5807', '214748.3647',
        |   '2024-05-01 10:30:00.123456', '2024-03-15', 'naïve café', 255),
        |  (2, '-0.0001', NULL, '1999-12-31 23:59:59', NULL, NULL, -32768),
        |  (3, NULL, '0.5000', NULL, '1970-01-01', 'plain', 32767))
        |SELECT l.leg, f.* FROM f,
        |  (VALUES ('pg'), ('mysql'), ('tds')) AS l(leg)
        |ORDER BY l.leg, f.id""".stripMargin,
    // a61: the a48 round trip with the listener in its from-byte-0 TLS
    // variant — same reconciled row set, encrypted produce+fetch hops
    "a61_kafkawire_tls" ->
      """SELECT doc_id, CAST(doc_id % 4 AS INT) AS bus_partition,
        |  CAST(length(text) AS BIGINT) AS text_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    // a47: the MySQL value quirks over the live socket — tinyint(1) kept
    // integral, DECIMAL(20,0) carries 2^64-1 exactly, zero-date → NULL
    "a47_mysqlwire_quirks" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 1, '18446744073709551615', DATE '2024-03-15'),
        |  (2, 0, '0', NULL),
        |  (3, 1, '9223372036854775808', NULL)
        |) AS t(id, flag_int, big_str, last_seen) ORDER BY id""".stripMargin,
    // Bus round-trip truth: every document exactly once, partitioned by
    // doc_id mod 4, payload = text length — loss/dup/corruption across
    // the produce+stream network hops changes the row set.
    // a48: the same round-trip truth over the Kafka wire protocol — the
    // produce+fetch hops change, the reconciled row set must not
    "a48_kafka_roundtrip" ->
      """SELECT doc_id, CAST(doc_id % 4 AS INT) AS bus_partition,
        |  CAST(length(text) AS BIGINT) AS text_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "a37_bus_roundtrip" ->
      """SELECT doc_id, CAST(doc_id % 4 AS INT) AS bus_partition,
        |  CAST(length(text) AS BIGINT) AS text_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    // warehouse truth after the multi-batch bus sync: the one-shot batch
    // aggregate — any lost/duplicated micro-batch merge changes a count
    "a38_bus_sync" ->
      """SELECT 's' || CAST(doc_id % 10 AS VARCHAR) AS key,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(length(text)) AS BIGINT) AS total
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // Point-in-time semantics replayed: each event joins the dimension
    // version whose validity range covers its event date.
    "a31_scd2_lookup" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |dim AS (
        |  SELECT user_id, DATE '2023-01-01' AS valid_from,
        |         DATE '2024-01-15' AS valid_to,
        |         'S' || CAST(user_id % 3 AS VARCHAR) AS seg FROM u
        |  UNION ALL
        |  SELECT user_id, DATE '2024-01-15', NULL,
        |         'S' || CAST(user_id % 5 AS VARCHAR) FROM u)
        |SELECT dim.seg, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  ROUND(SUM(e.value), 2) AS total_value
        |FROM events e JOIN dim ON e.user_id = dim.user_id
        |  AND CAST(e.ts AS DATE) >= dim.valid_from
        |  AND (dim.valid_to IS NULL OR CAST(e.ts AS DATE) < dim.valid_to)
        |GROUP BY dim.seg ORDER BY dim.seg""".stripMargin,
    // delta-sync ≡ full-sync: the published table after (snapshot run +
    // high-watermark incremental run) must equal one full export
    "a17_incremental_sync" ->
      """SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS p
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // The published table after (lake sync + signature artifact + delta
    // run deduped against the artifact) must equal: union corpus minus
    // delta docs holding a verified Jaccard >= 0.5 pair (the
    // dedup_incremental_lsh pair CTE — its green row proves banding
    // loses nothing at this threshold — with the drop rule replayed).
    "a30_incremental_dedup_sync" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |         array_to_string(list_slice(string_split(text, ' '), 1,
        |           len(string_split(text, ' ')) - 1), ' ') AS text
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
        |           i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
        |                || ' ' || string_split(text, ' ')[i+2])) AS shingles
        |  FROM corpus WHERE len(string_split(text, ' ')) >= 3
        |), ex AS (SELECT doc_id, unnest(shingles) AS sg FROM sh),
        |inter AS (
        |  SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS c
        |  FROM ex l JOIN ex r ON l.sg = r.sg AND l.doc_id < r.doc_id
        |  GROUP BY 1, 2
        |), sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
        |drops AS (
        |  SELECT DISTINCT b AS doc_id
        |  FROM inter JOIN sz na ON na.doc_id = a JOIN sz nb ON nb.doc_id = b
        |  WHERE c / CAST(na.n + nb.n - c AS DOUBLE) >= 0.5 AND b >= 1000000)
        |SELECT doc_id, md5(text) AS fp FROM corpus
        |WHERE doc_id NOT IN (SELECT doc_id FROM drops)
        |ORDER BY doc_id""".stripMargin,
    // both tables must resolve through the SAME manifest version (the
    // full second publish), so the oracle is the plain base-table join
    "a41_atomic_publish" ->
      """SELECT r.r_name, CAST(COUNT(*) AS BIGINT) AS n_nations
        |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin,
    // rule counts recomputed from the base table + injection formula;
    // the surviving row count proves batch 2 never reached the pointer
    "a44_write_audit_publish" ->
      """WITH c AS (
        |  SELECT c_custkey AS k, ROUND(c_acctbal, 2) AS bal FROM customer),
        |inj AS (SELECT k, ROUND(bal * 100, 2) AS bal FROM c
        |        WHERE k % 100 = 0),
        |bad AS (SELECT * FROM c UNION ALL SELECT * FROM inj)
        |SELECT CAST(1 AS BIGINT) AS batch, 'dup_keys' AS rule,
        |  CAST(0 AS BIGINT) AS violations, TRUE AS published
        |UNION ALL SELECT 1, 'null_keys', 0, TRUE
        |UNION ALL SELECT 1, 'range_violations', 0, TRUE
        |UNION ALL SELECT 2, 'dup_keys',
        |  (SELECT COUNT(*) - COUNT(DISTINCT k) FROM bad), FALSE
        |UNION ALL SELECT 2, 'null_keys', 0, FALSE
        |UNION ALL SELECT 2, 'range_violations',
        |  (SELECT COUNT(*) FROM bad WHERE bal < -1000 OR bal > 10000),
        |  FALSE
        |UNION ALL SELECT 9, 'published_rows',
        |  (SELECT COUNT(*) FROM c), TRUE
        |ORDER BY batch, rule""".stripMargin,
    // stage totals recomputed from the base tables; the engine must
    // reproduce them through the park/merge/retry storage hops
    "a43_late_arriving" ->
      """WITH f AS (
        |  SELECT o_orderkey AS k, o_custkey AS ck,
        |    ROUND(o_totalprice, 2) AS p
        |  FROM orders)
        |SELECT 'enriched_pass_1' AS stage, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(SUM(p), 2) AS total
        |FROM f WHERE ck % 3 <> 0
        |UNION ALL
        |SELECT 'enriched_pass_2', COUNT(*), ROUND(SUM(p), 2)
        |FROM f WHERE ck % 3 = 0 AND ck % 9 <> 0
        |UNION ALL
        |SELECT 'pending', COUNT(*), ROUND(SUM(p), 2)
        |FROM f WHERE ck % 9 = 0
        |ORDER BY stage""".stripMargin,
    // vacuumed versions are pinned literally as refused sentinel rows;
    // retained slices recomputed from the base table (the engine must
    // serve them from post-vacuum storage)
    "a42_retention_vacuum" ->
      """SELECT CAST(1 AS BIGINT) AS version, FALSE AS readable,
        |  CAST(-1 AS BIGINT) AS n, CAST(0.0 AS DOUBLE) AS total
        |UNION ALL
        |SELECT 2, FALSE, -1, 0.0
        |UNION ALL
        |SELECT 3, TRUE, COUNT(*),
        |  ROUND(SUM(ROUND(o_totalprice, 2)), 2)
        |FROM orders WHERE o_orderkey % 10 < 3
        |UNION ALL
        |SELECT 4, TRUE, COUNT(*),
        |  ROUND(SUM(ROUND(o_totalprice, 2)), 2)
        |FROM orders WHERE o_orderkey % 10 < 4
        |ORDER BY version""".stripMargin,
    // survivor-set aggregate after the purge-delete; the engine must
    // read it back from post-erasure storage
    "a40_gdpr_delete" ->
      """SELECT c_nationkey,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(SUM(ROUND(c_acctbal, 2)), 2) AS total_bal,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
        |   WHERE c_nationkey = 7) AS n_deleted
        |FROM customer WHERE c_nationkey <> 7
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    // the oracle recomputes both snapshot versions from the base table;
    // the engine must produce the identical feed from STORAGE
    "a39_snapshot_diff" ->
      """WITH v1 AS (
        |  SELECT o_orderkey AS k, ROUND(o_totalprice + 1000, 2) AS p
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |v2 AS (
        |  SELECT o_orderkey AS k, ROUND(o_totalprice, 2) AS p
        |  FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT COALESCE(v1.k, v2.k) AS k,
        |  CASE WHEN v1.k IS NULL THEN 'I'
        |       WHEN v2.k IS NULL THEN 'D'
        |       ELSE 'U' END AS change,
        |  v1.p AS old_p, v2.p AS new_p
        |FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
        |WHERE v1.k IS NULL OR v2.k IS NULL OR v1.p <> v2.p
        |ORDER BY k""".stripMargin,
  )
}
