package graft.core

import java.sql.Timestamp

import scala.collection.mutable

import graft.scheduler.{Cron, JobSpec}

/** Persistence for job schedules and config-driven pipeline definitions
  * over the ledger DB — the reference's `pd_schedule` +
  * `pd_pipeline_config`/`pd_node_config` machinery (pydin/db.py:33-52,
  * core.py:1418-1504). Gives the CLI/Driver a durable store, so
  * schedules survive process restarts like the reference's.
  */
final class Repository(source: DatabaseSource) {

  // ensure ledger tables exist
  new JdbcLedger(source)

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = source.connect()
    try f(c) finally c.close()
  }

  // ---- schedule (JobSpec <-> pd_schedule) --------------------------------

  def saveJob(spec: JobSpec): Long = withConn { c =>
    val ps = c.prepareStatement(
      """insert into pd_schedule
        (job_name, status, monthday, "hour", "minute", "second", weekday,
         yearday, trigger_list, start_date, end_date, timeout, parallelism,
         rerun_interval, rerun_limit, rerun_days, sleep_period, wake_up_period)
        values (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)""",
      java.sql.Statement.RETURN_GENERATED_KEYS)
    ps.setString(1, spec.name)
    ps.setString(2, if (spec.enabled) "Y" else "N")
    ps.setString(3, spec.schedule.mday.orNull)
    ps.setString(4, spec.schedule.hour.orNull)
    ps.setString(5, spec.schedule.min.orNull)
    ps.setString(6, spec.schedule.sec.orNull)
    ps.setString(7, spec.schedule.wday.orNull)
    ps.setString(8, spec.schedule.yday.orNull)
    ps.setString(9, if (spec.triggerList.isEmpty) null
      else spec.triggerList.mkString(";"))
    ps.setTimestamp(10, spec.startDate.map(Timestamp.valueOf).orNull)
    ps.setTimestamp(11, spec.endDate.map(Timestamp.valueOf).orNull)
    spec.timeoutSeconds match {
      case Some(t) => ps.setInt(12, t)
      case None => ps.setNull(12, java.sql.Types.INTEGER)
    }
    ps.setString(13, spec.parallelism)
    spec.rerunIntervalSeconds match {
      case Some(r) => ps.setInt(14, r)
      case None => ps.setNull(14, java.sql.Types.INTEGER)
    }
    ps.setInt(15, spec.rerunLimit)
    ps.setInt(16, spec.rerunDays)
    ps.setString(17, spec.sleepPeriod.orNull)
    ps.setString(18, spec.wakeUpPeriod.orNull)
    ps.executeUpdate()
    val keys = ps.getGeneratedKeys
    if (keys.next()) keys.getLong(1) else 0L
  }

  def setJobStatus(id: Long, enabled: Boolean): Unit = withConn { c =>
    val ps = c.prepareStatement("update pd_schedule set status = ? where id = ?")
    ps.setString(1, if (enabled) "Y" else "N"); ps.setLong(2, id)
    ps.executeUpdate()
  }

  def deleteJob(id: Long): Unit = withConn { c =>
    val ps = c.prepareStatement("delete from pd_schedule where id = ?")
    ps.setLong(1, id); ps.executeUpdate()
  }

  def loadJobs(): Seq[JobSpec] = withConn { c =>
    val rs = c.createStatement().executeQuery(
      """select id, job_name, status, monthday, "hour", "minute", "second",
        weekday, yearday, trigger_list, start_date, end_date, timeout,
        parallelism, rerun_interval, rerun_limit, rerun_days, sleep_period,
        wake_up_period from pd_schedule order by id""")
    val out = mutable.ListBuffer[JobSpec]()
    while (rs.next()) {
      def opt(i: Int): Option[String] = Option(rs.getString(i))
      def optInt(i: Int): Option[Int] = {
        val v = rs.getInt(i); if (rs.wasNull()) None else Some(v)
      }
      out += JobSpec(
        id = rs.getLong(1),
        name = rs.getString(2),
        enabled = rs.getString(3) == "Y",
        schedule = Cron.Schedule(opt(4), opt(5), opt(6), opt(7), opt(8), opt(9)),
        triggerList = opt(10).toSeq.flatMap(_.split(';'))
          .filter(_.nonEmpty).map(_.trim.toLong),
        startDate = Option(rs.getTimestamp(11)).map(_.toLocalDateTime),
        endDate = Option(rs.getTimestamp(12)).map(_.toLocalDateTime),
        timeoutSeconds = optInt(13),
        parallelism = Option(rs.getString(14)).getOrElse("N"),
        rerunIntervalSeconds = optInt(15),
        rerunLimit = rs.getInt(16),
        rerunDays = rs.getInt(17),
        sleepPeriod = opt(18),
        wakeUpPeriod = opt(19))
    }
    out.toSeq
  }

  // ---- pipeline/node configs ---------------------------------------------

  def savePipeline(jobId: Long, name: String,
                   nodes: Seq[PipelineConfig.NodeConfig]): Long = withConn { c =>
    val ps = c.prepareStatement(
      "insert into pd_pipeline_config (job_id, pipeline_name, status) values (?, ?, 'Y')",
      java.sql.Statement.RETURN_GENERATED_KEYS)
    ps.setLong(1, jobId); ps.setString(2, name)
    ps.executeUpdate()
    val keys = ps.getGeneratedKeys
    keys.next()
    val pid = keys.getLong(1)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      .registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    nodes.foreach { n =>
      val np = c.prepareStatement(
        """insert into pd_node_config
          (pipeline_id, node_name, node_type, node_seqno, node_config)
          values (?, ?, ?, ?, ?)""")
      np.setLong(1, pid); np.setString(2, n.nodeName)
      np.setString(3, n.nodeType); np.setInt(4, n.nodeSeqno)
      np.setString(5, mapper.writeValueAsString(n.config))
      np.executeUpdate()
    }
    pid
  }

  /** Hydrate the pipeline configured for `jobId` (core.py:1418-1466). */
  def loadPipeline(jobId: Long, sources: SourceRegistry,
                   ledger: Ledger = Ledger.none): Option[Pipeline] = withConn { c =>
    val ps = c.prepareStatement(
      """select id, pipeline_name from pd_pipeline_config
        where job_id = ? and status = 'Y' order by id""")
    ps.setLong(1, jobId)
    val rs = ps.executeQuery()
    if (!rs.next()) None
    else {
      val pid = rs.getLong(1)
      val name = rs.getString(2)
      val np = c.prepareStatement(
        """select node_name, node_type, node_seqno, node_config
          from pd_node_config where pipeline_id = ? order by node_seqno""")
      np.setLong(1, pid)
      val nrs = np.executeQuery()
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        .registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
      val nodes = mutable.ListBuffer[PipelineConfig.NodeConfig]()
      while (nrs.next()) {
        val conf = mapper.readValue(nrs.getString(4),
          classOf[Map[String, String]])
        nodes += PipelineConfig.NodeConfig(nrs.getString(1), nrs.getString(2),
          nrs.getInt(3), conf)
      }
      Some(PipelineConfig.build(name, nodes.toSeq, sources, ledger))
    }
  }
}
