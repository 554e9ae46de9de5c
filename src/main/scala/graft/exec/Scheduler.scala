package graft.exec

import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, Executors, TimeUnit}
import scala.collection.mutable
import scala.jdk.CollectionConverters._
import graft.model._

/** DAG scheduler mirroring the reference's design
  * (pkg/scheduler/scheduler.go:665-946):
  *
  *  - each asset expands into task *instances*: main + one per column check +
  *    one per custom check (checks are DAG nodes, scheduler.go:680-715);
  *  - check instances depend on their asset's main instance;
  *  - an asset's main instance depends on ALL *blocking* instances of its
  *    upstream assets (non-blocking checks don't gate, scheduler.go:822-831);
  *  - symbolic upstreams are lineage-only, never scheduled (scheduler.go:808-811);
  *  - a failure marks every transitive downstream instance UpstreamFailed.
  *
  * Execution: fixed worker pool consuming a runnable queue — the Scala
  * analogue of the reference's goroutine WorkQueue/Results loop
  * (pkg/executor/concurrent.go:69-160). Spark jobs issued from worker threads
  * share the SparkSession (FAIR-pool friendly).
  */
object Scheduler {

  sealed trait Status
  case object Pending        extends Status
  case object Running        extends Status
  case object Succeeded      extends Status
  case object Failed         extends Status
  case object UpstreamFailed extends Status
  case object Skipped        extends Status

  sealed trait InstanceType { def suffix: String }
  case object Main extends InstanceType { val suffix = "" }
  final case class ColumnCheckInstance(column: String, check: ColumnCheck) extends InstanceType {
    def suffix = s":check:$column:${check.name}"
  }
  final case class CustomCheckInstance(check: CustomCheck) extends InstanceType {
    def suffix = s":custom:${check.name}"
  }

  final case class Instance(asset: Asset, typ: InstanceType) {
    def id: String = asset.name + typ.suffix
    /** blocking instances gate downstream assets (pipeline.go:812: default true). */
    def blocking: Boolean = typ match {
      case Main                        => true
      case ColumnCheckInstance(_, ck)  => ck.blocking
      case CustomCheckInstance(ck)     => ck.blocking
    }
  }

  final case class Result(instance: Instance, status: Status, error: Option[Throwable],
                          attempts: Int, millis: Long)

  /** Thrown by an operator to mark its instance Skipped (not Failed) — e.g. a
    * skip-mode sensor whose condition is unmet. Downstream instances cascade
    * to Skipped, mirroring the reference's markTaskInstanceIfNotSkipped
    * downstream walk (scheduler.go:595-623). */
  final case class SkipTask(reason: String) extends RuntimeException(reason)

  /** The `--only` task-type name of an instance (reference run.go:765,
    * :961 — "main" / "checks"; metadata push is not an instance here, it
    * runs inside the main task). */
  def typeNameOf(i: Instance): String = i.typ match {
    case Main => "main"
    case _: ColumnCheckInstance | _: CustomCheckInstance => "checks"
  }

  /** Expand a pipeline (optionally filtered to `selected` asset names, and
    * to `only` task types) into instances + dependency edges. A dependency
    * on an instance excluded by `only` counts as satisfied: `--only checks`
    * validates existing tables without re-materializing them, `--only main`
    * materializes without gating on checks (the reference's --stream
    * restriction, run.go:945). */
  def expand(pipeline: Pipeline, selected: Option[Set[String]] = None,
             only: Set[String] = Set.empty)
    : (Seq[Instance], Map[String, Set[String]]) = {
    val assets = pipeline.assets.filter(a => selected.forall(_.contains(a.name)))
    val byName = assets.map(a => a.name -> a).toMap
    val instances = assets.flatMap { a =>
      val checks = a.columns.flatMap(c => c.checks.map(ck => Instance(a, ColumnCheckInstance(c.name, ck)))) ++
        a.customChecks.map(ck => Instance(a, CustomCheckInstance(ck)))
      Instance(a, Main) +: checks
    }
    val deps = mutable.Map[String, Set[String]]().withDefaultValue(Set.empty)
    instances.foreach {
      case i @ Instance(a, Main) =>
        // main depends on all blocking instances of scheduled upstreams
        val up = a.upstreams.filterNot(_.isSymbolic).map(_.value)
          .flatMap(byName.get)
          .flatMap { ua =>
            instances.filter(x => x.asset.name == ua.name && x.blocking).map(_.id)
          }
        deps(i.id) = up.toSet
      case i => // checks depend on their asset's main
        deps(i.id) = Set(i.asset.name)
    }
    if (only.isEmpty) (instances, deps.toMap)
    else {
      val kept = instances.filter(i => only(typeNameOf(i)))
      val keptIds = kept.map(_.id).toSet
      (kept, deps.toMap.collect { case (id, ds) if keptIds(id) => id -> (ds & keptIds) })
    }
  }

  /** Run with `concurrency` workers. `exec` performs one instance; throwing
    * fails it. Per-asset retries with `retryDelayMs` between attempts
    * (asset `retries`/`rerun_cooldown` parameters override per instance;
    * `timeout` bounds one attempt, reference pipeline.go:1332-1335).
    * `connectionLimits` caps parallel instances per connection via fair
    * semaphores (reference scheduler.go:387-493). */
  def run(pipeline: Pipeline,
          exec: Instance => Unit,
          concurrency: Int = 4,
          selected: Option[Set[String]] = None,
          retries: Int = 0,
          retryDelayMs: Long = 0L,
          connectionLimits: Map[String, Int] = Map.empty,
          /** instance ids already successful in a previous run (`--continue`,
            * reference cmd/run.go:1575-1589): counted as satisfied
            * dependencies, never re-executed. */
          completed: Set[String] = Set.empty,
          /** invoked when an attempt times out — gives the runner a chance to
            * cancel the instance's in-flight Spark jobs (job-group cancel). */
          onTimeout: Instance => Unit = _ => (),
          /** task-type restriction (reference --only): empty = all. */
          only: Set[String] = Set.empty): Map[String, Result] = {
    val semaphores = connectionLimits.collect {
      case (name, limit) if limit > 0 => name -> new java.util.concurrent.Semaphore(limit, true)
    }
    def withConnectionSlots[T](i: Instance)(body: => T): T = {
      // acquire in sorted order so two instances sharing connections never
      // deadlock on acquisition order
      val held = i.asset.connections.sorted.flatMap(semaphores.get)
      held.foreach(_.acquire())
      try body finally held.reverse.foreach(_.release())
    }
    def execOnce(i: Instance): Unit = i.asset.timeoutSeconds match {
      case scala.None => withConnectionSlots(i)(exec(i))
      case Some(sec) =>
        // run the attempt on a dedicated thread so it can be interrupted; the
        // connection permits are acquired AND released inside that thread —
        // if the attempt outlives its timeout (Spark actions don't always
        // honor interrupts), the zombie keeps holding its permits, so the
        // per-connection cap is never exceeded by newly admitted work
        var err: Option[Throwable] = scala.None
        val t = new Thread(() =>
          try withConnectionSlots(i)(exec(i))
          catch { case e: Throwable => err = Some(e) },
          s"graft-timeout-${i.id}")
        t.setDaemon(true)
        t.start()
        t.join(sec * 1000)
        if (t.isAlive) {
          try onTimeout(i) catch { case _: Throwable => () } // cancel Spark jobs
          t.interrupt()
          t.join(5000) // grace: let the attempt observe the cancel/interrupt
          throw new java.util.concurrent.TimeoutException(
            s"${i.id}: timed out after ${sec}s")
        }
        err.foreach(throw _)
    }
    val (instances, deps) = expand(pipeline, selected, only)
    val byId = instances.map(i => i.id -> i).toMap
    val downstream = mutable.Map[String, Set[String]]().withDefaultValue(Set.empty)
    deps.foreach { case (id, ups) => ups.foreach(u => downstream(u) += id) }

    val status = new ConcurrentHashMap[String, Status](instances.map(_.id -> (Pending: Status)).toMap.asJava)
    val results = new ConcurrentHashMap[String, Result]()
    val preDone = instances.filter(i => completed.contains(i.id))
    preDone.foreach { i =>
      status.put(i.id, Succeeded)
      results.put(i.id, Result(i, Succeeded, scala.None, 0, 0))
    }
    val remaining = new java.util.concurrent.atomic.AtomicInteger(instances.size - preDone.size)
    val done = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(math.max(1, concurrency))
    val lock = new Object

    def ready(id: String): Boolean =
      status.get(id) == Pending && deps(id).forall(d => status.get(d) == Succeeded)

    def terminal(id: String): Boolean = {
      val s = status.get(id)
      s == Succeeded || s == Failed || s == UpstreamFailed || s == Skipped
    }

    def cascade(id: String, to: Status): Unit = {
      downstream(id).foreach { d =>
        if (status.get(d) == Pending) {
          status.put(d, to)
          results.put(d, Result(byId(d), to, scala.None, 0, 0))
          if (remaining.decrementAndGet() == 0) done.countDown()
          cascade(d, to)
        }
      }
    }
    def cascadeUpstreamFailure(id: String): Unit = cascade(id, UpstreamFailed)

    def submitReady(): Unit = lock.synchronized {
      instances.filter(i => ready(i.id)).foreach { i =>
        status.put(i.id, Running)
        pool.submit(new Runnable {
          override def run(): Unit = {
            val t0 = System.nanoTime()
            val maxRetries = i.asset.retriesOverride.getOrElse(retries)
            val delayMs = i.asset.rerunCooldownSeconds.map(_ * 1000).getOrElse(retryDelayMs)
            var attempt = 0
            var err: Option[Throwable] = scala.None
            var ok = false
            var skip = false
            var fatal = false
            while (!ok && !skip && !fatal && attempt <= maxRetries) {
              attempt += 1
              try { execOnce(i); ok = true; err = scala.None }
              catch {
                case s: SkipTask => skip = true; err = Some(s)
                case e: java.util.concurrent.TimeoutException =>
                  // terminal: the timed-out attempt thread may still be
                  // draining (Spark actions don't always honor interrupts) —
                  // a retry would run a concurrent duplicate of the instance
                  err = Some(e); fatal = true
                case e: Throwable =>
                  err = Some(e)
                  if (attempt <= maxRetries && delayMs > 0) Thread.sleep(delayMs)
              }
            }
            val ms = (System.nanoTime() - t0) / 1000000
            lock.synchronized {
              if (ok) {
                status.put(i.id, Succeeded)
                results.put(i.id, Result(i, Succeeded, scala.None, attempt, ms))
              } else if (skip) {
                status.put(i.id, Skipped)
                results.put(i.id, Result(i, Skipped, scala.None, attempt, ms))
                if (i.blocking) cascade(i.id, Skipped)
              } else {
                status.put(i.id, Failed)
                results.put(i.id, Result(i, Failed, err, attempt, ms))
                if (i.blocking) cascadeUpstreamFailure(i.id)
                else ()
              }
              if (remaining.decrementAndGet() == 0) done.countDown()
              submitReady()
            }
          }
        })
      }
      // deadlock guard: nothing running, nothing ready, but instances pending
      val anyActive = instances.exists(i => status.get(i.id) == Running)
      val anyReady = instances.exists(i => ready(i.id))
      if (!anyActive && !anyReady && instances.exists(i => !terminal(i.id))) {
        instances.filter(i => !terminal(i.id)).foreach { i =>
          status.put(i.id, Skipped)
          results.put(i.id, Result(i, Skipped, scala.None, 0, 0))
          if (remaining.decrementAndGet() == 0) done.countDown()
        }
      }
    }

    if (instances.isEmpty || remaining.get() == 0) {
      pool.shutdown(); return results.asScala.toMap
    }
    submitReady()
    done.await(24, TimeUnit.HOURS)
    pool.shutdown()
    pool.awaitTermination(60, TimeUnit.SECONDS)
    results.asScala.toMap
  }
}
