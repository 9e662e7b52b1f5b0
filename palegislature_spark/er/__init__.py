"""Entity-resolution library (SURVEY §2.9 / M2).

The reference's signature capability — fuzzy name matching, blocked
dedup, rule-based repair — re-expressed as DataFrame operators:

    name_match   — is_same_name as a pure Column expression over two
                   {first,middle,last,suffix} structs (names.py:96-149
                   semantics; ambiguity returns NULL, never crashes)
    blocking     — generic block_join (candidate equi-join on blocking
                   keys + arbitrary match predicate), with salting
    components   — connected components over match edges (iterated
                   join to fixpoint) for transitive merge groups
    members      — find_duplicates analogue: candidate pairs, golden
                   record, service re-pointing
    repair       — apply_edits analogue: service add/remove rules,
                   global + time-windowed vote renames, member renames
    vote_names   — match_names analogue: two-pass vote-name resolution
"""

from palegislature_spark.er.blocking import block_join, self_block_pairs
from palegislature_spark.er.components import connected_components
from palegislature_spark.er.member_ingest import (
    service_from_observations,
    upsert_archive_members,
    upsert_current_members,
)
from palegislature_spark.er.members import candidate_pairs, merge_members
from palegislature_spark.er.name_match import (
    merge_names,
    name_struct,
    names_match,
    parse_vote_name,
)
from palegislature_spark.er.repair import (
    apply_member_renames,
    apply_service_rules,
    apply_vote_renames,
)
from palegislature_spark.er import validate
from palegislature_spark.er.vote_names import backfill_member_ids, match_vote_names

__all__ = [
    "apply_member_renames",
    "apply_service_rules",
    "apply_vote_renames",
    "backfill_member_ids",
    "block_join",
    "candidate_pairs",
    "connected_components",
    "match_vote_names",
    "merge_members",
    "merge_names",
    "name_struct",
    "names_match",
    "parse_vote_name",
    "self_block_pairs",
    "service_from_observations",
    "upsert_archive_members",
    "upsert_current_members",
    "validate",
]
