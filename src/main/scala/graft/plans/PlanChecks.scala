package graft.plans

/** Physical-plan shape checks shared by the flat-plan gates (TrainingCorpus
  * capstone spec, CorpusBench) and ad-hoc tooling.
  *
  * Spark prints physical nodes WITHOUT the `Exec` suffix (`WindowExec` →
  * `Window`), so a scan greping "WindowExec" never fires — a silent
  * false-green this object replaces. A window node prints
  * `Window [exprs], [partitionSpec], [orderSpec]` when partitioned and
  * `Window [exprs], [orderSpec]` when GLOBAL (empty partition spec): the
  * global form funnels the entire input through one task and is the shape
  * that does not survive a 100× scale-up. Partitioned windows are fine —
  * a task sees one key group.
  */
object PlanChecks {

  /** True when `line` is a physical Window node with an EMPTY partition
    * spec (two bracket groups instead of three). `WindowGroupLimit` lines
    * don't match the `"Window ["` anchor.
    */
  def isGlobalWindowLine(line: String): Boolean = {
    val i = line.indexOf("Window [")
    i >= 0 && line.substring(i).split("\\], \\[").length < 3
  }

  /** Scale-killer shapes in a physical plan string: cartesian products
    * and global (single-partition) windows. Returns one tag per finding,
    * empty = flat.
    */
  def scaleViolations(plan: String): Seq[String] = {
    val cartesian =
      if (plan.contains("CartesianProduct")) Seq("CartesianProduct") else Nil
    val globalWindows = plan.linesIterator
      .filter(isGlobalWindowLine)
      .map(l => "GlobalWindow: " + l.trim.take(120))
      .toSeq
    cartesian ++ globalWindows
  }
}
