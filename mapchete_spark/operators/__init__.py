"""Spark operators: tile assignment, pyramid reduction, halo joins,
checkpointed (resumable) execution, dedup family, similarity search."""
