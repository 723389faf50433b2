package graft.models

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.core._
import graft.core.Status

/** Shared JDBC plumbing for the database models. Query texts can come
  * inline or from a file (models.py:652-655 `text=`/`path=`), with
  * `{variable}` templating (models.py:917-919).
  */
trait JdbcQueryText {
  def text: Option[String]
  def textPath: Option[String]

  protected def queryText(ctx: StepContext): String = {
    val raw = text.orElse(textPath.map(p =>
      new String(Files.readAllBytes(Paths.get(p)), StandardCharsets.UTF_8)))
      .getOrElse(throw new IllegalArgumentException("no query text or path"))
    ctx.render(raw).trim.stripSuffix(";")
  }
}

/** DB table as source AND sink (pydin/models.py:440-611).
  *
  * Read: `spark.read.jdbc` — Spark's schema probe replaces the
  * reference's SQLAlchemy reflection (models.py:561-567); optional
  * `partitionColumn`/`numPartitions` is the scale analogue of chunked
  * fetch (models.py:579-587). Write: batched JDBC insert, `chunkSize` as
  * batchsize (models.py:589-594). `cleanup` purges via truncate-like
  * delete (models.py:452-459,596-609); `recycle` deletes rows stamped
  * with the run key (models.py:469-475) for idempotent re-runs.
  */
final case class TableModel(
    source: DatabaseSource,
    tableName: String,
    schemaName: Option[String] = None,
    dbLink: Option[String] = None,
    append: Boolean = true,
    partitionColumn: Option[String] = None,
    numPartitions: Option[Int] = None,
    override val knobs: ModelKnobs = ModelKnobs())
  extends PdModel with Extractable with Loadable {

  def qualifiedName: String = {
    val base = schemaName.map(s => s"$s.$tableName").getOrElse(tableName)
    dbLink.map(l => s"$base@$l").getOrElse(base)
  }

  protected def read(ctx: StepContext): DataFrame = {
    var r = ctx.spark.read.format("jdbc")
      .option("url", source.url)
      .option("dbtable", qualifiedName)
      .option("fetchsize", knobs.chunkSize)
    source.driver.foreach(d => r = r.option("driver", d))
    source.user.foreach(u => r = r.option("user", u))
    source.password.foreach(p => r = r.option("password", p))
    (partitionColumn, numPartitions) match {
      case (Some(c), Some(n)) =>
        // bounds probed once; at scale pass them in instead
        val bounds = ctx.spark.read.format("jdbc")
          .option("url", source.url)
          .option("query", s"select min($c), max($c) from $qualifiedName")
          .options(source.user.map("user" -> _).toMap)
          .options(source.password.map("password" -> _).toMap)
          .options(source.driver.map("driver" -> _).toMap)
          .load().collect()(0)
        if (!bounds.isNullAt(0)) {
          r = r.option("partitionColumn", c).option("numPartitions", n)
            .option("lowerBound", bounds.get(0).toString)
            .option("upperBound", bounds.get(1).toString)
        }
      case _ =>
    }
    r.load()
  }

  protected def write(ctx: StepContext, df: DataFrame): LoadResult = {
    df.write.mode(if (append) SaveMode.Append else SaveMode.Overwrite)
      .option("truncate", true) // preserve DDL on overwrite
      .option("batchsize", knobs.chunkSize)
      .jdbc(source.url, qualifiedName, source.jdbcProperties)
    LoadResult(-1L)
  }

  override def clean(ctx: StepContext): Unit = execUpdate(s"delete from $qualifiedName")

  override def recycle(ctx: StepContext, keyValue: Long): Unit =
    knobs.keyField.foreach(k =>
      execUpdate(s"delete from $qualifiedName where ${k.label} = $keyValue"))

  def rowCount(): Long = {
    val c = source.connect()
    try {
      val rs = c.createStatement().executeQuery(s"select count(*) from $qualifiedName")
      rs.next(); rs.getLong(1)
    } finally c.close()
  }

  private def execUpdate(sql: String): Int = {
    val c = source.connect()
    try c.createStatement().executeUpdate(sql) finally c.close()
  }

  override def lastValue(ctx: StepContext): Option[Any] =
    knobs.valueField.flatMap { v =>
      val c = source.connect()
      try {
        val rs = c.createStatement()
          .executeQuery(s"select max($v) from $qualifiedName")
        if (rs.next()) Option(rs.getObject(1)) else None
      } finally c.close()
    }
}

/** SQL SELECT as source (pydin/models.py:755-936). Spark's JDBC `query`
  * option performs the same empty-result schema probe the reference
  * hand-rolls (`where 1=0` — models.py:874-883). Date-window and HWM
  * predicates arrive as DataFrame filters and are pushed down by
  * Catalyst — reproducing the reference's SQL-text splicing
  * (models.py:856-867) without rewriting any SQL.
  */
final case class SelectModel(
    source: DatabaseSource,
    text: Option[String] = None,
    textPath: Option[String] = None,
    columns: Seq[String] = Nil,
    override val knobs: ModelKnobs = ModelKnobs())
  extends PdModel with Extractable with JdbcQueryText {

  protected def read(ctx: StepContext): DataFrame = {
    var r = ctx.spark.read.format("jdbc")
      .option("url", source.url)
      .option("query", queryText(ctx))
      .option("fetchsize", knobs.chunkSize)
    source.driver.foreach(d => r = r.option("driver", d))
    source.user.foreach(u => r = r.option("user", u))
    source.password.foreach(p => r = r.option("password", p))
    var df = r.load()
    if (columns.nonEmpty) df = df.toDF(columns: _*)
    df
  }
}

/** Arbitrary SQL script execution on a source DB (pydin/models.py:649-752):
  * DDL/DML passthrough the engine cannot (and should not) route through
  * DataFrames. Driver-side statement; affected-row count becomes the
  * result metric. Statements split on `;` with a literal-aware scanner
  * (the reference uses sqlparse.split, models.py:700-704): semicolons
  * inside quoted strings, quoted identifiers, or comments do not split.
  * Vendor hints (Oracle `/*+ parallel */`) pass through untouched inside
  * the user's text.
  */
/** Literal-aware SQL script splitting: `;` terminates a statement only
  * outside '…' / "…" literals (with doubled-quote escapes), line comments
  * (`--`), and block comments. The Scala twin of sqlparse.split used by
  * the reference (models.py:700-704).
  */
object SqlScript {
  def split(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    val n = text.length
    var mode: Char = ' ' // ' '=code, '\''=string, '"'=ident, '-'=line, '*'=block
    var blockStart = -1   // index of the '/' that opened a block comment
    while (i < n) {
      val ch = text.charAt(i)
      mode match {
        case ' ' =>
          if (ch == ';') { out += cur.result(); cur.clear() }
          else {
            if (ch == '\'' || ch == '"') mode = ch
            else if (ch == '-' && i + 1 < n && text.charAt(i + 1) == '-') mode = '-'
            else if (ch == '/' && i + 1 < n && text.charAt(i + 1) == '*') {
              mode = '*'; blockStart = i
            }
            cur += ch
          }
        case '\'' | '"' =>
          cur += ch
          if (ch == mode) {
            // doubled quote is an escaped quote, stay in the literal
            if (i + 1 < n && text.charAt(i + 1) == mode) { cur += mode; i += 1 }
            else mode = ' '
          }
        case '-' =>
          cur += ch
          if (ch == '\n') mode = ' '
        case '*' =>
          cur += ch
          // "*/" closes, but the closer may not overlap the "/*" opener
          if (ch == '/' && text.charAt(i - 1) == '*' && i >= blockStart + 3)
            mode = ' '
        case _ => cur += ch
      }
      i += 1
    }
    out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}

/** Vendor hint injection (models.py:921-936, 1147-1170): on Oracle
  * sources, `/*+ parallel(n) */` after the first top-level SELECT and
  * `/*+ append */` after the first top-level INSERT. Other vendors pass
  * through untouched — hints are comment syntax elsewhere, but the
  * reference scopes injection to Oracle and so do we. The keyword scan
  * is literal/comment-aware (a `select` inside a string or comment is
  * never hinted).
  */
object SqlHints {
  /** Effective vendor: the explicit `vendor` or the JDBC subprotocol
    * ("jdbc:oracle:thin:..." -> "oracle"). */
  def vendorOf(source: DatabaseSource): String =
    source.vendor.map(_.toLowerCase).getOrElse {
      val u = source.url.toLowerCase
      if (u.startsWith("jdbc:")) u.drop(5).takeWhile(_ != ':') else ""
    }

  /** Splice `hint` after the first standalone `keyword` occurring
    * outside string/identifier literals and comments. */
  private[models] def inject(text: String, keyword: String, hint: String): String = {
    val n = text.length
    var i = 0
    while (i < n) {
      text.charAt(i) match {
        case q @ ('\'' | '"') =>
          i += 1
          while (i < n && text.charAt(i) != q) i += 1
          i += 1 // past the closing quote (doubled quotes just re-enter)
        case '-' if i + 1 < n && text.charAt(i + 1) == '-' =>
          while (i < n && text.charAt(i) != '\n') i += 1
        case '/' if i + 1 < n && text.charAt(i + 1) == '*' =>
          i += 2
          while (i + 1 < n && !(text.charAt(i) == '*' && text.charAt(i + 1) == '/')) i += 1
          i += 2
        case c if Character.isLetter(c) =>
          val start = i
          while (i < n && (Character.isLetterOrDigit(text.charAt(i)) ||
            text.charAt(i) == '_')) i += 1
          if (text.substring(start, i).equalsIgnoreCase(keyword))
            return s"${text.substring(0, i)} $hint${text.substring(i)}"
        case _ => i += 1
      }
    }
    text
  }

  /** `parallel` degree <= 0 disables; 1 emits the bare `/*+ parallel */`
    * (the reference's `parallel=True`); n > 1 emits `/*+ parallel(n) */`. */
  def hintinize(text: String, vendor: String, parallel: Int = 0,
                append: Boolean = false): String =
    if (vendor != "oracle") text
    else {
      var t = text
      if (parallel > 0)
        t = inject(t, "select",
          if (parallel == 1) "/*+ parallel */" else s"/*+ parallel($parallel) */")
      if (append) t = inject(t, "insert", "/*+ append */")
      t
    }
}

final case class SqlModel(
    source: DatabaseSource,
    text: Option[String] = None,
    textPath: Option[String] = None,
    /** Oracle parallel-DML degree (models.py:921-936); 0 = off. */
    parallel: Int = 0,
    override val knobs: ModelKnobs = ModelKnobs())
  extends PdModel with Executable with JdbcQueryText {

  def execute(ctx: StepContext): ExecResult = {
    val text = SqlHints.hintinize(queryText(ctx), SqlHints.vendorOf(source),
      parallel = parallel)
    val c = source.connect()
    try {
      var total = 0L
      for (stmt <- SqlScript.split(text)) {
        val s = c.createStatement()
        try {
          val isRs = s.execute(stmt)
          if (!isRs && s.getUpdateCount >= 0) total += s.getUpdateCount
        } finally s.close()
      }
      // query-log bookkeeping (Query.save_as_completed - models.py:629-646)
      ctx.ledger.logQuery(ctx, modelName, text, total, Status.Done)
      ExecResult(resultValue = Some(total))
    } catch {
      case e: java.sql.SQLException =>
        ctx.ledger.logQuery(ctx, modelName, text, -1L, Status.Error,
          Some(e.getMessage))
        throw e
    } finally c.close()
  }
}

/** DB-side `INSERT INTO target SELECT ...` (pydin/models.py:939-1188) —
  * the no-data-movement fast path when source and target share a
  * database. The key field is injected as a literal select column
  * (models.py:1089-1092); date-window / HWM predicates are rendered into
  * the SELECT's WHERE (models.py:1094-1105); `cleanup` truncates first
  * (models.py:979-990); `recycle` deletes by key (models.py:971-977);
  * the HWM probe is `select max(value_field) from target`
  * (models.py:1172-1178).
  *
  * For cross-database movement use SelectModel → TableModel instead (the
  * engine path).
  */
final case class InsertModel(
    source: DatabaseSource,
    tableName: String,
    schemaName: Option[String] = None,
    select: Option[String] = None,
    selectPath: Option[String] = None,
    /** Oracle hints (models.py:1147-1170): parallel-SELECT degree and
      * direct-path `/*+ append */` on the INSERT; inert off-Oracle. */
    parallel: Int = 0,
    appendHint: Boolean = false,
    override val knobs: ModelKnobs = ModelKnobs())
  extends PdModel with Executable with JdbcQueryText {

  def text: Option[String] = select
  def textPath: Option[String] = selectPath

  def qualifiedName: String =
    schemaName.map(s => s"$s.$tableName").getOrElse(tableName)

  private def sqlLiteral(v: Any): String = v match {
    case s: String => s"'${s.replace("'", "''")}'"
    case t: java.sql.Timestamp => s"TIMESTAMP '${t.toString.stripSuffix(".0")}'"
    case d: java.time.LocalDateTime =>
      s"TIMESTAMP '${d.toString.replace('T', ' ')}'"
    case other => String.valueOf(other)
  }

  /** The final INSERT ... SELECT statement, with knob predicates and key
    * column spliced in (the one place the engine still composes SQL
    * text, because the work happens entirely inside the source DB). */
  def statement(ctx: StepContext): String = {
    var sel = queryText(ctx)
    val preds = Seq.newBuilder[String]
    knobs.dateField.foreach { f =>
      val t = knobs.targetDate(ctx.calendar)
      preds += s"$f between ${sqlLiteral(t.start)} and ${sqlLiteral(t.end)}"
    }
    knobs.valueField.foreach { f =>
      knobs.targetValue.orElse(lastValue(ctx)).foreach(v =>
        preds += s"$f > ${sqlLiteral(v)}")
    }
    val ps = preds.result()
    if (ps.nonEmpty)
      sel = s"select * from ($sel) q where ${ps.mkString(" and ")}"
    val stmt = knobs.keyField match {
      case Some(k) if knobs.insertKeyField =>
        s"insert into $qualifiedName select q.*, ${ctx.runId} as ${k.label} from ($sel) q"
      case _ => s"insert into $qualifiedName $sel"
    }
    SqlHints.hintinize(stmt, SqlHints.vendorOf(source),
      parallel = parallel, append = appendHint)
  }

  def execute(ctx: StepContext): ExecResult = {
    val sqlText = statement(ctx)
    val c = source.connect()
    try {
      if (knobs.cleanup)
        c.createStatement().executeUpdate(s"delete from $qualifiedName")
      val n = c.createStatement().executeUpdate(sqlText)
      ctx.ledger.logQuery(ctx, modelName, sqlText, n.toLong, Status.Done)
      ExecResult(resultValue = Some(n.toLong))
    } catch {
      case e: java.sql.SQLException =>
        ctx.ledger.logQuery(ctx, modelName, sqlText, -1L, Status.Error,
          Some(e.getMessage))
        throw e
    } finally c.close()
  }

  override def recycle(ctx: StepContext, keyValue: Long): Unit =
    knobs.keyField.foreach { k =>
      val c = source.connect()
      try c.createStatement().executeUpdate(
        s"delete from $qualifiedName where ${k.label} = $keyValue")
      finally c.close()
    }

  override def lastValue(ctx: StepContext): Option[Any] =
    knobs.valueField.flatMap { v =>
      val c = source.connect()
      try {
        val rs = c.createStatement()
          .executeQuery(s"select max($v) from $qualifiedName")
        if (rs.next()) Option(rs.getObject(1)) else None
      } finally c.close()
    }
}
