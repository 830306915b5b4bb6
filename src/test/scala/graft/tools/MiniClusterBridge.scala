package org.apache.spark.deploy

import org.apache.spark.SparkConf
import org.apache.spark.deploy.master.Master
import org.apache.spark.deploy.worker.Worker
import org.apache.spark.rpc.RpcEnv

/** Test-only standalone mini-cluster whose two workers register
  * DISTINCT hostnames — the one thing `local-cluster[2,...]` cannot do.
  *
  * Why it exists: speculative execution's task placement refuses any
  * host that already ran an attempt of the task
  * (`TaskSetManager.dequeueSpeculativeTask` filters on
  * `hasAttemptOnHost`), and `LocalSparkCluster` registers every worker
  * under the same local hostname — so on a single machine a straggler
  * can be MARKED speculatable but a duplicate attempt can never be
  * LAUNCHED, making an in-process speculation rehearsal structurally
  * vacuous. This container's /etc/hosts ships two loopback aliases
  * (`runsc`, `vm`); starting the workers under those names gives the
  * scheduler a legal second host while everything still binds 127.0.0.1.
  *
  * Package-located under org.apache.spark.deploy for the
  * `private[deploy]` Master/Worker launchers (same pattern as the
  * engine's other bridge accessors).
  */
object GraftMiniCluster {
  private var envs: List[RpcEnv] = Nil

  /** Starts master + one worker per alias; returns the spark:// URL.
    * Each worker gets `cores` cores and `memoryMb` MiB and its own
    * scratch workDir.
    */
  def start(conf: SparkConf, workerHosts: Seq[String], cores: Int,
      memoryMb: Int): String = synchronized {
    require(envs.isEmpty, "mini cluster already running")
    workerHosts.foreach { h =>
      try java.net.InetAddress.getByName(h)
      catch { case e: java.net.UnknownHostException =>
        throw new IllegalStateException(
          s"worker alias '$h' does not resolve — the speculation " +
            "rehearsal needs two distinct loopback hostnames (this " +
            "container ships runsc/vm in /etc/hosts)", e)
      }
    }
    val masterConf = conf.clone()
      .set("spark.master.rest.enabled", "false")
      .set("spark.shuffle.service.enabled", "false")
    val (masterEnv, _, _) =
      Master.startRpcEnvAndEndpoint("localhost", 0, 0, masterConf)
    val masterUrl = s"spark://localhost:${masterEnv.address.port}"
    val workers = workerHosts.zipWithIndex.map { case (h, i) =>
      val workDir = java.nio.file.Files
        .createTempDirectory(s"graft_minicluster_w$i").toString
      Worker.startRpcEnvAndEndpoint(h, 0, 0, cores, memoryMb,
        Array(masterUrl), workDir, Some(i + 1), conf.clone(), None)
    }
    envs = masterEnv :: workers.toList
    masterUrl
  }

  /** Shut everything down (no-op if never started). Call AFTER
    * SparkSession.stop() so the app deregisters and the workers kill
    * their executor child processes first.
    */
  def stop(): Unit = synchronized {
    envs.foreach { e => e.shutdown(); e.awaitTermination() }
    envs = Nil
  }
}
