"""Reference-parity table builders (SURVEY §7 steps 2/4/5).

Each builder is a pure ``DataFrame -> DataFrame`` pipeline mirroring one of
the reference's 31 registry tables, re-expressed declaratively so Catalyst
plans the physical execution. IO, merge policies, DQ and batch promotion are
layered on from ``io.writers`` / ``plans.quality`` / ``io.catalog``.
"""

from .gold import (  # noqa: F401
    gold_constituency_activity_yearly,
    gold_content_fact_pool,
    gold_current_members,
    gold_member_activity_monthly,
    gold_member_activity_yearly,
)
from .consumers import member_profile_metrics  # noqa: F401
from .silver import (  # noqa: F401
    silver_constituencies,
    silver_houses,
    silver_parties,
    silver_division_tallies,
    silver_divisions,
    silver_member_constituencies,
    silver_member_memberships,
    silver_member_offices,
    silver_member_parties,
    silver_member_votes,
    silver_members,
    silver_questions,
    silver_source_files,
)
from .debates import (  # noqa: F401
    silver_debate_records,
    silver_debate_sections,
    silver_speeches,
    weekly_sentence_candidates,
)
from .bills import (  # noqa: F401
    silver_bill_debates,
    silver_bill_events,
    silver_bill_related_docs,
    silver_bill_sponsors,
    silver_bill_stages,
    silver_bill_versions,
    silver_bills,
)
from .compat import (  # noqa: F401
    compat_summary,
    member_votes_compat,
    members_compat,
)
