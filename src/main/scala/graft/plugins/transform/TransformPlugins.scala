package graft.plugins.transform

import java.nio.file.Path

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Errors, MultiStreamTransformPlugin, PluginExecutionError,
  SchemaValidationError, TransformPlugin}

/** Shared plumbing for transform plugins. */
abstract class BaseTransformPlugin(val options: Map[String, Any],
                                   val configDir: Path,
                                   override val label: String)
    extends TransformPlugin {

  protected def required(key: String): Either[Throwable, Any] =
    options.get(key).toRight(
      new PluginExecutionError(s"Option '$key' is required"))

  protected def requiredString(key: String): Either[Throwable, String] =
    required(key).map(_.toString)

  protected def stringList(key: String): Either[Throwable, Seq[String]] =
    required(key).flatMap {
      case xs: Seq[_] => Right(xs.map(_.toString))
      case s: String => Right(Seq(s))
      case other => Left(new PluginExecutionError(
        s"Option '$key' must be a list of strings, got: $other"))
    }

  /** Symbolic schema propagation without data: apply `f` to an EMPTY
    * frame with the input schema and read the result schema. This is
    * Catalyst's analyzer doing exactly what Polars' dry-run schema
    * walk does (ref pipeline.py:61-94) — resolution only, no job. */
  protected def propagateSchema(schema: StructType)(
      f: DataFrame => DataFrame): Either[Throwable, StructType] =
    Errors.safe {
      val spark = SparkSession.active
      f(spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)).schema
    }.left.map(e => new SchemaValidationError(e.getMessage, e))
}

/** A5/A6 — the reference's only shipped transform: multiply one numeric
  * column by a coefficient, preserving the column name
  * (ref /root/reference/.../transform/multiplier.py:21-85; option names
  * and error messages kept verbatim). */
class ColumnMultiplierPlugin(options: Map[String, Any], configDir: Path, label: String)
    extends BaseTransformPlugin(options, configDir, label) {
  def name: String = "column_multiplier"

  private def opts(): Either[Throwable, (String, Double)] =
    for {
      c <- options.get("column_name").toRight(
        new PluginExecutionError("Option 'column_name' is required"))
      m <- options.get("multiplier").toRight(
        new PluginExecutionError("Option 'multiplier' is required"))
      mv <- Errors.safe(m.toString.toDouble).left.map(_ =>
        new PluginExecutionError(s"Option 'multiplier' must be numeric, got: $m"))
    } yield (c.toString, mv)

  def execute(df: DataFrame): Either[Throwable, DataFrame] =
    opts().flatMap { case (c, m) =>
      Errors.safe {
        // Match Polars dtype semantics (multiplier.py runs on Polars):
        // a whole multiplier keeps the column's own dtype (Int8 stays
        // Int8, Float32 stays Float32 — Spark's `*` would widen to
        // long/double), and any multiplier keeps a float column's
        // width. Only integral × fractional widens (to double, Polars
        // f64). This also keeps execute consistent with dryRun's
        // schema-unchanged contract for whole multipliers.
        val whole = m == m.floor && !m.isInfinite
        val k: Column = if (whole) lit(m.toLong) else lit(m)
        val orig = df.schema(c).dataType
        val prod = col(c) * k
        // Decimals are EXCLUDED from the cast-back: Spark's
        // decimal-narrowing cast NULLs on overflow (silent data
        // loss), so a decimal product keeps its widened precision
        // instead. Integer cast-back FAILS LOUDLY on overflow under
        // Spark's default ANSI mode (CAST_OVERFLOW) — the honest
        // fixed-width contract; `preserve_dtype = false` opts back
        // into the widen-to-long/double behavior for pipelines whose
        // values genuinely outgrow the column's type.
        val preserve = options.get("preserve_dtype")
          .forall(_.toString.toBoolean)
        val out =
          if (!preserve ||
              orig.isInstanceOf[org.apache.spark.sql.types.DecimalType]) prod
          else if (whole
              || orig.isInstanceOf[org.apache.spark.sql.types.FloatType]
              || orig.isInstanceOf[org.apache.spark.sql.types.DoubleType])
            prod.cast(orig)
          else prod
        df.withColumn(c, out)
      }
    }

  def dryRun(schema: StructType): Either[Throwable, StructType] =
    opts().flatMap { case (c, m) =>
      schema.fields.find(_.name == c) match {
        case None => Left(new SchemaValidationError(
          s"Column '$c' not found in schema"))
        case Some(f) if !f.dataType.isInstanceOf[NumericType] =>
          Left(new SchemaValidationError(
            s"Column '$c' has type ${f.dataType.simpleString}, expected numeric type"))
        case Some(_) =>
          // declare what execute actually produces, so `check` is
          // trustworthy (integral/decimal x fractional widens to
          // double, decimal x whole widens precision): symbolic
          // propagation through execute on an empty frame — no
          // hand-modeled type rules to drift (the reference's dry_run
          // claims unchanged even where its runtime widens; accuracy
          // wins here)
          propagateSchema(schema)(df =>
            execute(df).fold(e => throw e, identity))
      }
    }
}

/** Filter by a SQL predicate expression — the doc'd filter vocabulary
  * (ref docs/plugin_development.md:1510-1512, :536-548). Using
  * `expr(...)` keeps zero custom parsing and full Catalyst pushdown. */
class FilterPlugin(options: Map[String, Any], configDir: Path, label: String)
    extends BaseTransformPlugin(options, configDir, label) {
  def name: String = "filter"

  def execute(df: DataFrame): Either[Throwable, DataFrame] =
    requiredString("predicate").flatMap(p => Errors.safe(df.filter(expr(p))))

  def dryRun(schema: StructType): Either[Throwable, StructType] =
    requiredString("predicate").flatMap(p =>
      propagateSchema(schema)(_.filter(expr(p))))
}

/** Projection (ref docs/plugin_development.md:1506-1508). `columns`
  * entries may be bare names or SQL expressions with `AS` aliases. */
class SelectPlugin(options: Map[String, Any], configDir: Path, label: String)
    extends BaseTransformPlugin(options, configDir, label) {
  def name: String = "select"

  def execute(df: DataFrame): Either[Throwable, DataFrame] =
    stringList("columns").flatMap(cs =>
      Errors.safe(df.select(cs.map(expr): _*)))

  def dryRun(schema: StructType): Either[Throwable, StructType] =
    stringList("columns").flatMap(cs =>
      propagateSchema(schema)(_.select(cs.map(expr): _*)))
}

/** Drop columns (ref docs/plugin_development.md:1518-1519; dry-run
  * pattern :769-791). */
class DropPlugin(options: Map[String, Any], configDir: Path, label: String)
    extends BaseTransformPlugin(options, configDir, label) {
  def name: String = "drop"

  def execute(df: DataFrame): Either[Throwable, DataFrame] =
    stringList("columns").flatMap(cs => Errors.safe(df.drop(cs: _*)))

  def dryRun(schema: StructType): Either[Throwable, StructType] =
    stringList("columns").flatMap { cs =>
      val missing = cs.filterNot(c => schema.fieldNames.contains(c))
      if (missing.nonEmpty)
        Left(new SchemaValidationError(
          s"Column '${missing.head}' not found in schema"))
      else Right(StructType(schema.fields.filterNot(f => cs.contains(f.name))))
    }
}

/** Add/replace a column from a SQL expression
  * (ref docs/plugin_development.md:1514-1516). */
class WithColumnPlugin(options: Map[String, Any], configDir: Path, label: String)
    extends BaseTransformPlugin(options, configDir, label) {
  def name: String = "with_column"

  def execute(df: DataFrame): Either[Throwable, DataFrame] =
    for {
      c <- requiredString("column")
      e <- requiredString("expression")
      out <- Errors.safe(df.withColumn(c, expr(e)))
    } yield out

  def dryRun(schema: StructType): Either[Throwable, StructType] =
    for {
      c <- requiredString("column")
      e <- requiredString("expression")
      out <- propagateSchema(schema)(_.withColumn(c, expr(e)))
    } yield out
}

/** Cast a column (ref examples/generate_sample_data.py:82-91 `df.cast`). */
class CastPlugin(options: Map[String, Any], configDir: Path, label: String)
    extends BaseTransformPlugin(options, configDir, label) {
  def name: String = "cast"

  def execute(df: DataFrame): Either[Throwable, DataFrame] =
    for {
      c <- requiredString("column")
      t <- requiredString("dtype")
      out <- Errors.safe(df.withColumn(c, col(c).cast(t)))
    } yield out

  def dryRun(schema: StructType): Either[Throwable, StructType] =
    for {
      c <- requiredString("column")
      t <- requiredString("dtype")
      _ <- if (schema.fieldNames.contains(c)) Right(())
           else Left(new SchemaValidationError(s"Column '$c' not found in schema"))
      out <- propagateSchema(schema)(_.withColumn(c, col(c).cast(t)))
    } yield out
}

/** Rename columns (ref docs/plugin_development.md:1570-1571). Mapping
  * comes from an `[..options.mapping]` table (old = "new"). */
class RenamePlugin(options: Map[String, Any], configDir: Path, label: String)
    extends BaseTransformPlugin(options, configDir, label) {
  def name: String = "rename"

  private def mapping(): Either[Throwable, Map[String, String]] =
    required("mapping").flatMap {
      case m: Map[_, _] =>
        Right(m.asInstanceOf[Map[String, Any]].map { case (k, v) => k -> v.toString })
      case other => Left(new PluginExecutionError(
        s"Option 'mapping' must be a table of old = \"new\" pairs, got: $other"))
    }

  def execute(df: DataFrame): Either[Throwable, DataFrame] =
    mapping().flatMap(m => Errors.safe(df.withColumnsRenamed(m)))

  def dryRun(schema: StructType): Either[Throwable, StructType] =
    mapping().flatMap { m =>
      val missing = m.keys.filterNot(schema.fieldNames.contains)
      if (missing.nonEmpty)
        Left(new SchemaValidationError(
          s"Column '${missing.head}' not found in schema"))
      else Right(StructType(schema.fields.map(f =>
        f.copy(name = m.getOrElse(f.name, f.name)))))
    }
}

/** Group-by aggregation (ref docs/plugin_development.md:1521-1522;
  * config shape :1220-1227). `aggregations` are SQL aggregate
  * expressions with aliases, e.g. `"sum(amount) as total"`. Catalyst
  * plans partial (map-side) + final aggregation automatically — the
  * shuffle moves only the aggregated state, not the input rows, which
  * is what keeps this correct at 100 TB. */
class GroupByAggPlugin(options: Map[String, Any], configDir: Path, label: String)
    extends BaseTransformPlugin(options, configDir, label) {
  def name: String = "group_by_agg"

  /** Two option shapes: `aggregations` = SQL aggregate expressions
    * with aliases (primary), or the reference's documented shape
    * (docs/plugin_development.md:1220-1227) `agg_columns` +
    * `agg_fn` → one `fn(col) AS col_fn` per column. */
  private def aggExprs(): Either[Throwable, Seq[String]] =
    options.get("aggregations") match {
      case Some(_) => stringList("aggregations")
      case None =>
        for {
          cols <- stringList("agg_columns")
          fn = options.get("agg_fn").map(_.toString).getOrElse("sum")
        } yield cols.map(c => s"$fn($c) AS ${c}_$fn")
    }

  private def build(df: DataFrame): Either[Throwable, DataFrame] =
    for {
      keys <- stringList("group_by")
      aggs <- aggExprs()
      _ <- if (aggs.isEmpty)
             Left(new PluginExecutionError("Option 'aggregations' must be non-empty"))
           else Right(())
      out <- Errors.safe(
        df.groupBy(keys.map(col): _*)
          .agg(expr(aggs.head), aggs.tail.map(expr): _*))
    } yield out

  def execute(df: DataFrame): Either[Throwable, DataFrame] = build(df)

  def dryRun(schema: StructType): Either[Throwable, StructType] =
    propagateSchemaVia(schema)

  private def propagateSchemaVia(schema: StructType): Either[Throwable, StructType] =
    propagateSchema(schema)(df => build(df).fold(e => throw e, identity))
}

/** Join with the stream of another label (`right_label`) — the
  * cryoflow-shaped join: two labeled input streams meet in one plugin
  * (ref docs/plugin_development.md:1524-1525 for the vocabulary;
  * multi-stream routing pipeline.py:143-186).
  *
  * Scale notes: `broadcast = true` hints a broadcast-hash join (use for
  * dimension tables — no shuffle of the big side); otherwise Catalyst/
  * AQE pick sort-merge vs broadcast from size stats at runtime.
  */
class JoinPlugin(options: Map[String, Any], configDir: Path, label: String)
    extends BaseTransformPlugin(options, configDir, label)
    with MultiStreamTransformPlugin {
  def name: String = "join"

  private def rightLabel(): Either[Throwable, String] = requiredString("right_label")

  def executeWith(df: DataFrame,
                  streams: Map[String, Either[Throwable, DataFrame]])
      : Either[Throwable, DataFrame] =
    for {
      rl <- rightLabel()
      right <- streams.getOrElse(rl, Left(new NoSuchElementException(
        s"No input data with label '$rl' for join plugin")))
      on <- stringList("on")
      how = options.get("how").map(_.toString).getOrElse("inner")
      out <- Errors.safe {
        val r = if (options.get("broadcast").exists(_.toString.toBoolean))
          org.apache.spark.sql.functions.broadcast(right) else right
        df.join(r, on, how)
      }
    } yield out

  def dryRunWith(schema: StructType,
                 schemas: Map[String, Either[Throwable, StructType]])
      : Either[Throwable, StructType] =
    for {
      rl <- rightLabel()
      rs <- schemas.getOrElse(rl, Left(new NoSuchElementException(
        s"No input data with label '$rl' for join plugin")))
      on <- stringList("on")
      how = options.get("how").map(_.toString).getOrElse("inner")
      out <- Errors.safe {
        val spark = SparkSession.active
        val l = spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
        val r = spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), rs)
        l.join(r, on, how).schema
      }.left.map(e => new SchemaValidationError(e.getMessage, e))
    } yield out
}

/** Sort (ref docs/plugin_development.md:1527-1528). `by` is a list of
  * column names; `descending` a matching bool list (or single bool).
  * This is a global sort (range-partitioned shuffle) — at scale prefer
  * sortWithinPartitions unless total order is truly required. */
class SortPlugin(options: Map[String, Any], configDir: Path, label: String)
    extends BaseTransformPlugin(options, configDir, label) {
  def name: String = "sort"

  private def sortCols(): Either[Throwable, Seq[Column]] =
    stringList("by").map { bys =>
      val desc: Seq[Boolean] = options.get("descending") match {
        case Some(b: Boolean) => Seq.fill(bys.size)(b)
        case Some(xs: Seq[_]) => xs.map(_.toString.toBoolean)
        case Some(other) => Seq.fill(bys.size)(other.toString.toBoolean)
        case None => Seq.fill(bys.size)(false)
      }
      bys.zip(desc).map { case (c, d) => if (d) col(c).desc else col(c).asc }
    }

  def execute(df: DataFrame): Either[Throwable, DataFrame] =
    sortCols().flatMap(cs => Errors.safe(df.orderBy(cs: _*)))

  def dryRun(schema: StructType): Either[Throwable, StructType] =
    stringList("by").flatMap { bys =>
      val missing = bys.filterNot(schema.fieldNames.contains)
      if (missing.nonEmpty)
        Left(new SchemaValidationError(
          s"Column '${missing.head}' not found in schema"))
      else Right(schema)
    }
}

/** when/then/otherwise conditional column
  * (ref docs/plugin_development.md:1561-1562). */
class WhenThenPlugin(options: Map[String, Any], configDir: Path, label: String)
    extends BaseTransformPlugin(options, configDir, label) {
  def name: String = "when_then"

  def execute(df: DataFrame): Either[Throwable, DataFrame] =
    for {
      c <- requiredString("column")
      cond <- requiredString("when")
      thenE <- requiredString("then")
      otherE = options.get("otherwise").map(_.toString)
      out <- Errors.safe {
        val base = when(expr(cond), expr(thenE))
        df.withColumn(c, otherE.fold(base)(o => base.otherwise(expr(o))))
      }
    } yield out

  def dryRun(schema: StructType): Either[Throwable, StructType] =
    for {
      c <- requiredString("column")
      cond <- requiredString("when")
      thenE <- requiredString("then")
      otherE = options.get("otherwise").map(_.toString)
      out <- propagateSchema(schema) { df =>
        val base = when(expr(cond), expr(thenE))
        df.withColumn(c, otherE.fold(base)(o => base.otherwise(expr(o))))
      }
    } yield out
}

/** Distinct / dropDuplicates (subset optional). */
class DistinctPlugin(options: Map[String, Any], configDir: Path, label: String)
    extends BaseTransformPlugin(options, configDir, label) {
  def name: String = "distinct"

  def execute(df: DataFrame): Either[Throwable, DataFrame] =
    Errors.safe {
      options.get("columns") match {
        case Some(xs: Seq[_]) => df.dropDuplicates(xs.map(_.toString))
        case Some(s) => df.dropDuplicates(Seq(s.toString))
        case None => df.distinct()
      }
    }

  def dryRun(schema: StructType): Either[Throwable, StructType] = Right(schema)
}

/** Limit / top-k head. */
class LimitPlugin(options: Map[String, Any], configDir: Path, label: String)
    extends BaseTransformPlugin(options, configDir, label) {
  def name: String = "limit"

  def execute(df: DataFrame): Either[Throwable, DataFrame] =
    required("n").flatMap(n =>
      Errors.safe(df.limit(n.toString.toDouble.toInt)))

  def dryRun(schema: StructType): Either[Throwable, StructType] =
    required("n").map(_ => schema)
}

/** Union with another labeled stream (by name, allowing missing
  * columns off by default). */
class UnionPlugin(options: Map[String, Any], configDir: Path, label: String)
    extends BaseTransformPlugin(options, configDir, label)
    with MultiStreamTransformPlugin {
  def name: String = "union"

  def executeWith(df: DataFrame,
                  streams: Map[String, Either[Throwable, DataFrame]])
      : Either[Throwable, DataFrame] =
    for {
      rl <- requiredString("right_label")
      right <- streams.getOrElse(rl, Left(new NoSuchElementException(
        s"No input data with label '$rl' for union plugin")))
      out <- Errors.safe {
        if (options.get("by_name").exists(_.toString.toBoolean))
          df.unionByName(right,
            allowMissingColumns =
              options.get("allow_missing_columns").exists(_.toString.toBoolean))
        else df.union(right)
      }
    } yield out

  def dryRunWith(schema: StructType,
                 schemas: Map[String, Either[Throwable, StructType]])
      : Either[Throwable, StructType] =
    for {
      rl <- requiredString("right_label")
      rs <- schemas.getOrElse(rl, Left(new NoSuchElementException(
        s"No input data with label '$rl' for union plugin")))
      _ <- if (rs.size == schema.size) Right(())
           else Left(new SchemaValidationError(
             s"Union requires same column count: ${schema.size} vs ${rs.size}"))
    } yield schema
}

/** Free-form SQL over the labeled streams: every stream is registered
  * as a temp view named by its label (the plugin's own stream also as
  * `input`), then `query` runs through Spark SQL. The escape hatch that
  * makes the engine's full SQL surface reachable from configs.
  *
  * Views are registered in a PRIVATE child session
  * (`SparkSession.newSession()`: shares the SparkContext, SharedState
  * cache, and the extensions, but has its own temp-view registry), so
  * two pipelines sharing one SparkSession never race on the `input` /
  * label view names. Frames cross sessions by logical plan
  * ([[org.apache.spark.sql.graftshim.DatasetShim]]) — no recompute,
  * lineage and pushdown intact — and the result is re-bound to the
  * caller's session so downstream plugins see nothing unusual. */
class SqlPlugin(options: Map[String, Any], configDir: Path, label: String)
    extends BaseTransformPlugin(options, configDir, label)
    with MultiStreamTransformPlugin {
  def name: String = "sql"

  private def rebind(target: SparkSession, df: DataFrame): DataFrame =
    org.apache.spark.sql.graftshim.DatasetShim.ofRows(target,
      org.apache.spark.sql.graftshim.DatasetShim.analyzed(df))

  def executeWith(df: DataFrame,
                  streams: Map[String, Either[Throwable, DataFrame]])
      : Either[Throwable, DataFrame] =
    for {
      q <- requiredString("query")
      out <- Errors.safe {
        val parent = df.sparkSession
        val scratch = parent.newSession()
        rebind(scratch, df).createOrReplaceTempView("input")
        streams.foreach {
          case (l, Right(sdf)) =>
            rebind(scratch, sdf).createOrReplaceTempView(l)
          case _ => ()
        }
        rebind(parent, scratch.sql(q))
      }
    } yield out

  def dryRunWith(schema: StructType,
                 schemas: Map[String, Either[Throwable, StructType]])
      : Either[Throwable, StructType] =
    for {
      q <- requiredString("query")
      out <- Errors.safe {
        val scratch = SparkSession.active.newSession()
        def empty(s: StructType) = scratch.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), s)
        empty(schema).createOrReplaceTempView("input")
        schemas.foreach {
          case (l, Right(s)) => empty(s).createOrReplaceTempView(l)
          case _ => ()
        }
        scratch.sql(q).schema
      }.left.map(e => new SchemaValidationError(e.getMessage, e))
    } yield out
}
