package graft

import org.apache.spark.sql.types.TimestampType

/** Corpus-contract gate (r7 verdict #5): every column the engine's
  * operators reference, with the physical types the loaders can handle,
  * asserted against the SCANNED schema of every scale factor present on
  * disk. A driver-side corpus regeneration that drifts a dtype (the r6
  * events.ts incident: INT64 TIMESTAMP(NANOS) → timestamp[us] broke 39
  * queries at runtime) now fails HERE, as one named test per table, with
  * the scanned-vs-expected diff in the message.
  *
  * Schema reads are parquet-footer-only — the whole suite costs
  * milliseconds per table, no data scan.
  */
class CorpusDriftSpec extends SparkSpec {

  /** Accepted `DataType.simpleString` per column. More than one entry
    * means the LOADER adapts to all of them (events.ts routes through
    * Tables.normalizeTs); exactly one means the operators require it. */
  private val contract: Seq[(String, Map[String, Set[String]])] = Seq(
    "region"   -> Map("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation"   -> Map("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
                      "n_regionkey" -> Set("int")),
    "customer" -> Map("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
                      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
                      "c_mktsegment" -> Set("string")),
    "supplier" -> Map("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
                      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part"     -> Map("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
                      "p_brand" -> Set("string"), "p_type" -> Set("string"),
                      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders"   -> Map("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
                      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
                      "o_orderdate" -> Set("timestamp", "timestamp_ntz", "date"),
                      "o_orderpriority" -> Set("string")),
    "lineitem" -> Map("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
                      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
                      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
                      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
                      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
                      "l_shipdate" -> Set("timestamp", "timestamp_ntz", "date")),
    "documents"  -> Map("doc_id" -> Set("bigint"), "text" -> Set("string"),
                        "lang" -> Set("string"), "source" -> Set("string"),
                        "n_chars" -> Set("bigint")),
    "embeddings" -> Map("vec_id" -> Set("bigint"),
                        "embedding" -> Set("array<float>"),
                        "label" -> Set("int")),
    // ts: bigint = legacy INT64 nanos under nanosAsLong; both timestamp
    // encodings normalize through Tables.normalizeTs (TsEncodingSpec)
    "events" -> Map("event_id" -> Set("bigint"),
                    "ts" -> Set("bigint", "timestamp", "timestamp_ntz"),
                    "user_id" -> Set("bigint"), "event_type" -> Set("string"),
                    "value" -> Set("double"), "props" -> Set("string")),
  )

  private val dirs: Seq[String] =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(d).isDirectory)

  assert(dirs.nonEmpty, "no testdata scale factors found")

  contract.foreach { case (t, cols) =>
    test(s"corpus contract: $t (scanned dtypes at ${dirs.size} scale factors)") {
      dirs.foreach { d =>
        val schema = spark.read.parquet(s"$d/$t.parquet").schema
        cols.foreach { case (name, accepted) =>
          val f = schema.find(_.name == name)
          assert(f.isDefined,
            s"$d/$t.parquet DRIFT: column '$name' missing (scanned: ${schema.simpleString})")
          val got = f.get.dataType.simpleString
          assert(accepted.contains(got),
            s"$d/$t.parquet DRIFT: '$name' scanned as $got, loaders handle $accepted")
        }
      }
    }
  }

  test("events loader normalizes every accepted ts encoding to TimestampType") {
    dirs.foreach { d =>
      assert(Tables.events(spark, d).schema("ts").dataType === TimestampType,
        s"$d: Tables.events must present TimestampType ts")
    }
  }
}
