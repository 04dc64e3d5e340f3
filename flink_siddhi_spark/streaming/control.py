"""Control events for dynamic query management.

Mirrors the reference's control surface (control/ControlEvent.java:24-48,
MetadataControlEvent.java:21-104, OperationControlEvent.java:21-59,
ControlMessage JSON envelope control/ControlMessage.java:24-45):
``{"type": "<kind>", "payload": {...}}`` on a control topic/stream.

Spark re-architecture (SURVEY.md §3.2): control events drive a DRIVER-side
``QueryManager`` that starts/stops independent ``StreamingQuery`` DAGs —
no in-stream multiplexing or broadcast routing operator is needed because
Spark queries are cheap, isolated, and individually checkpointed.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

RESERVED_CONTROL_STREAM = "_internal_control_stream"  # ControlEvent.java:25


@dataclass
class MetadataControlEvent:
    added_execution_plan_map: dict[str, str] = field(default_factory=dict)
    updated_execution_plan_map: dict[str, str] = field(default_factory=dict)
    deleted_execution_plan_id: list[str] = field(default_factory=list)

    TYPE = "MetadataControlEvent"


@dataclass
class OperationControlEvent:
    action: str  # ENABLE_QUERY | DISABLE_QUERY
    query_id: str

    TYPE = "OperationControlEvent"


def to_json(event) -> str:
    if isinstance(event, MetadataControlEvent):
        payload = {
            "addedExecutionPlanMap": event.added_execution_plan_map,
            "updatedExecutionPlanMap": event.updated_execution_plan_map,
            "deletedExecutionPlanId": event.deleted_execution_plan_id,
        }
        return json.dumps({"type": event.TYPE, "payload": payload})
    if isinstance(event, OperationControlEvent):
        return json.dumps(
            {"type": event.TYPE, "payload": {"action": event.action, "queryId": event.query_id}}
        )
    raise TypeError(f"not a control event: {event!r}")


def from_json(text: str):
    msg = json.loads(text)
    kind, payload = msg.get("type"), msg.get("payload", {})
    if kind == MetadataControlEvent.TYPE:
        return MetadataControlEvent(
            payload.get("addedExecutionPlanMap") or {},
            payload.get("updatedExecutionPlanMap") or {},
            payload.get("deletedExecutionPlanId") or [],
        )
    if kind == OperationControlEvent.TYPE:
        return OperationControlEvent(payload["action"], payload["queryId"])
    raise ValueError(f"unknown control event type: {kind}")
