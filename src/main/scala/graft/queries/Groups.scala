package graft.queries

import graft.Q

/** Single place new query groups get registered. */
object Groups {
  def all: Seq[Q] =
    Relational.qs ++ Events.qs ++ Reference.qs ++
      Dedup.qs ++ Text.qs ++ Similarity.qs ++ MultimodalQ.qs ++
      Retrieval.qs ++ EntityRes.qs ++ Web.qs
}
