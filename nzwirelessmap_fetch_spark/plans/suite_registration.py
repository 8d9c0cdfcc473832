"""Registers every implemented query with the registry.

Kept as one import-side-effect module so `registry.queries()` stays the
single source of truth for the driver contract and SURVEY.md §2 coverage.
"""

from __future__ import annotations

from . import flagship as _flagship
from . import registry

registry.register("p2p_links", _flagship.flagship, _flagship.FLAGSHIP_ORACLE_SQL)
