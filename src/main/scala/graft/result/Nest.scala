package graft.result

import scala.collection.immutable.ListMap

/** Generic d3-style nest (ref C7, nest.rb:11-84): group a driver-side
  * collection by successive key functions into a ListMap tree, with an
  * optional rollup at the leaves. The reference uses this to index
  * caption-properties {Dim → {Level → [Prop]}}; it is driver-side plumbing,
  * never a Spark operator. */
object Nest {

  def nest[A](items: Seq[A], keys: Seq[A => Any],
      rollup: Seq[A] => Any = (xs: Seq[A]) => xs): Any =
    keys match {
      case Nil => rollup(items)
      case k +: rest =>
        val grouped = ListMap.newBuilder[Any, Any]
        items.groupBy(k).toSeq
          .sortBy(_._1.toString)
          .foreach { case (kv, group) =>
            grouped += kv -> nest(group, rest, rollup)
          }
        grouped.result()
    }
}
