package graft.core

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Global configuration (pydin/config.py:95-156 + the `user_config` INI
  * that `create_config` writes, api.py:468-519): GENERAL / DATABASE /
  * API / SCHEDULER sections with the reference's defaults. Everything is
  * data — knobs flow into constructors ([[schedulerFrom]]); nothing is
  * read from global mutable state.
  */
final case class GraftConfig(
    owner: Option[String] = None,
    editor: Option[String] = None,
    debug: Boolean = false,
    databaseUrl: Option[String] = None,
    databaseUser: Option[String] = None,
    databasePassword: Option[String] = None,
    databaseVendor: Option[String] = None,
    apiHost: String = "127.0.0.1",
    apiPort: Int = 8080,
    apiToken: Option[String] = None,
    schedulerName: Option[String] = None,
    schedulerDesc: Option[String] = None,
    /** SCHEDULER.chargers_number (config.py:146) — in-process twin keeps
      * charging on the tick thread, the knob is recorded for parity. */
    chargersNumber: Int = 5,
    /** SCHEDULER.executors_number (config.py:147) → executor pool size. */
    executorsNumber: Int = 20,
    /** SCHEDULER.refresh_interval seconds (config.py:149). */
    refreshInterval: Int = 300,
    /** SCHEDULER.rerun_delay seconds (config.py:150). */
    rerunDelay: Int = 14400,
    rerunEnabled: Boolean = true,
    rerunInterval: Int = 60,
    wakeupEnabled: Boolean = true,
    wakeupInterval: Int = 60,
    /** EMAIL.* (config.py:130-138): failure-alarm transport; toggle off
      * by default like the reference. */
    emailToggle: Boolean = false,
    emailHost: Option[String] = None,
    emailPort: Int = 25,
    emailAddress: Option[String] = None) {

  /** The metadata DB source, when configured. */
  def database(name: String = "graftdb"): Option[DatabaseSource] =
    databaseUrl.map(u => DatabaseSource(name, u, user = databaseUser,
      password = databasePassword, vendor = databaseVendor))
}

object GraftConfig {

  val default: GraftConfig = GraftConfig()

  /** Load from an INI file; absent keys keep the reference defaults. */
  def load(file: File): GraftConfig = {
    val sections = SourceRegistry.parseIni(file)
      .map { case (n, kv) => n.toUpperCase -> kv }.toMap
    def sec(n: String) = sections.getOrElse(n, Map.empty[String, String])
    val g = sec("GENERAL"); val d = sec("DATABASE")
    val a = sec("API"); val s = sec("SCHEDULER"); val e = sec("EMAIL")
    def int(m: Map[String, String], k: String, dflt: Int) =
      m.get(k).filter(_.nonEmpty).map(_.toInt).getOrElse(dflt)
    def bool(m: Map[String, String], k: String, dflt: Boolean) =
      m.get(k).filter(_.nonEmpty).map(v =>
        v == "true" || v == "True" || v == "Y" || v == "1").getOrElse(dflt)
    GraftConfig(
      owner = g.get("owner").filter(_.nonEmpty),
      editor = g.get("editor").filter(_.nonEmpty),
      debug = bool(g, "debug", default.debug),
      databaseUrl = d.get("url").filter(_.nonEmpty),
      databaseUser = d.get("username").filter(_.nonEmpty),
      databasePassword = d.get("password").filter(_.nonEmpty),
      databaseVendor = d.get("vendor_name").filter(_.nonEmpty),
      apiHost = a.get("host").filter(_.nonEmpty).getOrElse(default.apiHost),
      apiPort = int(a, "port", default.apiPort),
      apiToken = a.get("token").filter(_.nonEmpty),
      schedulerName = s.get("name").filter(_.nonEmpty),
      schedulerDesc = s.get("desc").filter(_.nonEmpty),
      chargersNumber = int(s, "chargers_number", default.chargersNumber),
      executorsNumber = int(s, "executors_number", default.executorsNumber),
      refreshInterval = int(s, "refresh_interval", default.refreshInterval),
      rerunDelay = int(s, "rerun_delay", default.rerunDelay),
      rerunEnabled = bool(s, "rerun_enabled", default.rerunEnabled),
      rerunInterval = int(s, "rerun_interval", default.rerunInterval),
      wakeupEnabled = bool(s, "wakeup_enabled", default.wakeupEnabled),
      wakeupInterval = int(s, "wakeup_interval", default.wakeupInterval),
      emailToggle = bool(e, "toggle", default.emailToggle),
      emailHost = e.get("host").filter(_.nonEmpty),
      emailPort = int(e, "port", default.emailPort),
      emailAddress = e.get("address").filter(_.nonEmpty))
  }

  /** Write the skeleton config the install wizard creates
    * (api.py:468-519): every key present, defaults filled, secrets blank.
    */
  def writeSkeleton(path: String, dbUrl: Option[String] = None): Unit = {
    val text =
      s"""# graft global config (reference: pydin config.py:95-156)
         |[GENERAL]
         |debug =
         |editor =
         |owner =
         |
         |[DATABASE]
         |url = ${dbUrl.getOrElse("")}
         |vendor_name =
         |username =
         |password =
         |
         |[API]
         |host = ${default.apiHost}
         |port = ${default.apiPort}
         |token =
         |
         |[SCHEDULER]
         |name =
         |desc =
         |chargers_number = ${default.chargersNumber}
         |executors_number = ${default.executorsNumber}
         |refresh_interval = ${default.refreshInterval}
         |rerun_delay = ${default.rerunDelay}
         |rerun_enabled = true
         |rerun_interval = ${default.rerunInterval}
         |wakeup_enabled = true
         |wakeup_interval = ${default.wakeupInterval}
         |
         |[EMAIL]
         |toggle = false
         |host =
         |port = ${default.emailPort}
         |address =
         |""".stripMargin
    Files.write(Paths.get(path), text.getBytes(StandardCharsets.UTF_8))
  }

  /** sources.ini skeleton (utils.py:1194-1290 sections). */
  def writeSourcesSkeleton(path: String): Unit = {
    val text =
      """# named data sources (reference: sources.ini)
        |# [warehouse]
        |# url = jdbc:postgresql://host:5432/db
        |# vendor_name = postgresql
        |# username =
        |# password =
        |
        |# [landing]
        |# protocol = file
        |# host = localhost
        |# root = /data/landing
        |""".stripMargin
    Files.write(Paths.get(path), text.getBytes(StandardCharsets.UTF_8))
  }

  /** Build a scheduler honoring the config's pool/rerun knobs. */
  def schedulerFrom(cfg: GraftConfig, runner: graft.scheduler.JobRunner,
                    ledger: Option[JdbcLedger] = None): graft.scheduler.Scheduler = {
    val alerter: graft.scheduler.Alerter =
      if (cfg.emailToggle && cfg.emailHost.nonEmpty)
        new graft.scheduler.SmtpAlerter(cfg.emailHost.get, cfg.emailPort,
          cfg.emailAddress.getOrElse("graft@localhost"))
      else graft.scheduler.Alerter.Noop
    new graft.scheduler.Scheduler(runner,
      executorThreads = cfg.executorsNumber,
      ledger = ledger,
      rerunDelaySeconds = cfg.rerunDelay.toLong,
      alerter = alerter)
  }
}
