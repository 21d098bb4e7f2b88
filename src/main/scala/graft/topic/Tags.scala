package graft.topic

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.topic.TopicTree.NodeSpec

/** Tag CRUD → topic-tree construction (reference topic/Tag.scala:7-17
  * TagOperation, :55-82 mergeWith, :105-124 getTags, :132-190
  * calculateTree).
  *
  * Tags are an append-only operation log: `create`/`update` carry the full
  * definition, `delete` tombstones (a LATER `create` resurrects — reference
  * mergeWith case (delete, create) => newer), `addFilter`/`removeFilter`
  * patch the filter set of the current state. Resolution folds each id's
  * operations in timestamp order; the reference does this with
  * repartition(id) + sortWithinPartitions + mapPartitions — here it is the
  * typed groupByKey equivalent (same single shuffle on the id).
  */
object Tags {

  object Op {
    val Create = "create"
    val Update = "update"
    val Delete = "delete"
    val AddFilter = "addFilter"
    val RemoveFilter = "removeFilter"
  }

  /** One tag operation. `algo` in {clustering, supervised, analogy};
    * `outClasses` are the classes the tag's node emits; `filterValue` the
    * classes that route documents into it (empty or Seq(0) = root). */
  case class Tag(
      id: Int, operation: String, ts: Long, name: String,
      algo: String = "clustering", outClasses: Seq[Int] = Nil,
      filterValue: Seq[Int] = Nil, maxTopWords: Int = 8,
      childSplitSize: Int = 0)

  /** Fold `newer` into the current state (reference Tag.scala:55-73). */
  private def foldOp(state: Tag, newer: Tag): Tag =
    (state.operation, newer.operation) match {
      case (Op.Delete, Op.Create) => newer
      case (Op.Delete, _) => state // tombstone sticks until a create
      case (_, Op.AddFilter) =>
        state.copy(filterValue = (state.filterValue ++ newer.filterValue).distinct)
      case (_, Op.RemoveFilter) =>
        state.copy(filterValue = state.filterValue.filterNot(newer.filterValue.contains))
      case _ => newer // update / create replace wholesale
    }

  /** Resolve the operation log to current tag states: one row per
    * surviving id. Single shuffle on id; per-id fold in timestamp order
    * (ties broken by operation then name for engine-independence). */
  def resolve(ds: Dataset[Tag]): Dataset[Tag] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.id)
      .mapGroups { (_, it) =>
        val ops = it.toSeq.sortBy(t => (t.ts, t.operation, t.name))
        ops.tail.foldLeft(ops.head)(foldOp)
      }
      .filter(_.operation != Op.Delete)
  }

  /** Build the node tree from resolved tags (reference Tag.scala:132-190
    * calculateTree): tags with empty / {0} filterValue are placeable at the
    * root level; every other tag attaches beneath a placed tag whose
    * outClasses cover its filterValue. Iterates until all tags place;
    * throws when a pass makes no progress (unattachable tags — same error
    * contract as the reference). Returns the first-placed root's spec with
    * its nested children. */
  def calculateTree(tags: Seq[Tag]): NodeSpec = {
    require(tags.nonEmpty, "no tags")
    val placed = scala.collection.mutable.ArrayBuffer.empty[Tag]
    val children = scala.collection.mutable.ArrayBuffer.empty[List[Int]]
    var rest = tags.toList
    while (rest.nonEmpty) {
      val (attached, unattached) = rest.partition { tag =>
        if (tag.filterValue.isEmpty || tag.filterValue == Seq(0)) {
          placed += tag; children += Nil
          true
        } else {
          placed.zipWithIndex.find { case (p, _) =>
            tag.filterValue.forall(p.outClasses.contains)
          } match {
            case Some((_, i)) =>
              placed += tag; children += Nil
              children(i) = children(i) :+ (placed.length - 1)
              true
            case None => false
          }
        }
      }
      if (attached.isEmpty)
        throw new IllegalArgumentException(
          s"cannot attach tags ${unattached.map(_.id).mkString(",")} to the tree")
      rest = unattached
    }
    def build(i: Int): NodeSpec = {
      val t = placed(i)
      NodeSpec(
        name = t.name,
        algo = TopicTree.algoOf(t.algo),
        classes = t.outClasses,
        filterMode =
          if (t.algo == "supervised") TopicTree.AnyIn else TopicTree.AllIn,
        maxTopWords = t.maxTopWords,
        children = children(i).map(build),
        childSplitSize = t.childSplitSize)
    }
    build(0)
  }

  /** resolve + calculateTree over a dataset of operations. */
  def treeFromOps(ds: Dataset[Tag]): NodeSpec = {
    val resolved = resolve(ds).collect().sortBy(_.id).toSeq
    calculateTree(resolved)
  }
}
