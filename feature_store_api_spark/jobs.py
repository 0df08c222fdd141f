"""Thin Job / Execution / JobSchedule metadata surface.

Parity targets: the reference's platform-side job objects —
``core/job.py:94`` (``Job.run`` / ``Job.get_state`` /
``Job.job_schedule``), ``core/execution.py:22`` (execution state +
final status), ``core/job_schedule.py:27`` (cron schedule record) —
surfaced through ``feature_group.py:3490`` ``materialization_job``.

In the reference these are handles onto a remote job orchestrator: the
materialization job moves Kafka-buffered stream inserts into the
offline store on a schedule. This engine has no platform side — stream
inserts land offline per micro-batch (``streaming/insert_stream.py``)
and bounded backfills run via ``Trigger.AvailableNow`` — so the ONLY
real recurring work a materialization job represents here is folding
the commit store's merge-on-read tail into a read-optimized base
(compaction), plus the online store's same cadence. ``Job.run``
therefore executes exactly that, synchronously, and the object records
real executions; the schedule is metadata (this library does not own a
scheduler process — wire ``cron_expression`` into whatever scheduler
invokes your pipelines).

States use the reference's vocabulary (``INITIALIZING``, ``RUNNING``,
``FINISHED``, ``FAILED``) so tooling ported from reference code can
filter on them.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Callable, Dict, List, Optional


class JobSchedule:
    """Cron-expression schedule record (parity ``core/job_schedule.py:27``:
    same field names, millisecond-epoch round-trip in ``to_dict``)."""

    def __init__(
        self,
        start_date_time,
        enabled: bool = True,
        cron_expression: str = "",
        next_execution_date_time=None,
        id: Optional[int] = None,
        end_date_time=None,
        **_: Any,
    ) -> None:
        def _ts(v):
            if isinstance(v, (int, float)):
                return _dt.datetime.fromtimestamp(
                    v / 1000, tz=_dt.timezone.utc
                )
            return v

        self.id = id
        self.start_date_time = _ts(start_date_time)
        self.end_date_time = _ts(end_date_time)
        self.enabled = bool(enabled)
        self.cron_expression = cron_expression
        self.next_execution_date_time = _ts(next_execution_date_time)

    def to_dict(self) -> Dict[str, Any]:
        def _ms(v):
            return int(v.timestamp() * 1000.0) if v else None

        return {
            "id": self.id,
            "startDateTime": _ms(self.start_date_time),
            "endDateTime": _ms(self.end_date_time),
            "cronExpression": self.cron_expression,
            "enabled": self.enabled,
        }


class Execution:
    """One run of a Job (parity ``core/execution.py:22``)."""

    def __init__(
        self,
        id: int,
        state: str,
        final_status: Optional[str] = None,
        submission_time=None,
        error: Optional[str] = None,
    ) -> None:
        self.id = id
        self.state = state
        self.final_status = final_status
        self.submission_time = submission_time
        self.error = error

    @property
    def success(self) -> Optional[bool]:
        if self.final_status is None:
            return None
        return self.final_status == "SUCCEEDED"


class Job:
    """A named unit of engine work with reference-shaped state
    introspection. ``action`` is the real work ``run()`` executes
    (synchronously — there is no remote orchestrator to detach to;
    ``await_termination=False`` still runs it, matching the reference's
    'launch then optionally wait' contract as a degenerate case)."""

    def __init__(
        self,
        name: str,
        action: Callable[[], Any],
        config: Optional[Dict[str, Any]] = None,
    ) -> None:
        self.name = name
        self.config = dict(config or {})
        self.href = None  # no web UI in a library engine
        self.job_schedule: Optional[JobSchedule] = None
        self._action = action
        self._executions: List[Execution] = []

    # -- parity Job.run (core/job.py:94) -----------------------------------
    def run(self, args: Optional[str] = None, await_termination: bool = True):
        ex = Execution(
            id=len(self._executions) + 1,
            state="RUNNING",
            submission_time=_dt.datetime.now(_dt.timezone.utc),
        )
        self._executions.append(ex)
        try:
            result = self._action() if args is None else self._action(args)
        except Exception as exc:
            ex.state = "FINISHED"
            ex.final_status = "FAILED"
            ex.error = f"{type(exc).__name__}: {exc}"
            raise
        ex.state = "FINISHED"
        ex.final_status = "SUCCEEDED"
        return result

    # -- parity Job.get_state / get_final_state ----------------------------
    def get_state(self) -> str:
        if not self._executions:
            raise ValueError(f"No executions found for job {self.name!r}")
        return self._executions[-1].state

    def get_final_state(self) -> Optional[str]:
        if not self._executions:
            raise ValueError(f"No executions found for job {self.name!r}")
        return self._executions[-1].final_status

    @property
    def executions(self) -> List[Execution]:
        return list(self._executions)

    # -- parity Job.schedule / unschedule ----------------------------------
    def schedule(
        self,
        cron_expression: str,
        start_time=None,
        end_time=None,
    ) -> JobSchedule:
        """Attach schedule METADATA (parity ``core/job.py`` schedule).
        This engine does not own a scheduler daemon; persist/read the
        ``cron_expression`` from whatever actually triggers runs."""
        self.job_schedule = JobSchedule(
            start_date_time=start_time
            or _dt.datetime.now(_dt.timezone.utc),
            enabled=True,
            cron_expression=cron_expression,
            end_date_time=end_time,
        )
        return self.job_schedule

    def unschedule(self) -> None:
        self.job_schedule = None
