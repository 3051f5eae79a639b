"""The reference's canonical online-shop scenario, end to end.

Mirrors /root/reference/examples/online_shop: orders must be paid within
the timeout; unpaid orders emit a derived timeout event; a chained
reminder rule consumes it and dispatches the "send email" action.

Run:  python examples/online_shop.py
"""

from __future__ import annotations

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from php_ec_spark.engine import chain_correlate
from php_ec_spark.rules import match_single, sequence_rule
from php_ec_spark.session import get_spark
from php_ec_spark.streaming.sinks import ActionDispatcher


def main() -> None:
    spark = get_spark(app_name="online-shop-example", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (0, t0, 101, "shop:order:placed", 99.95, None),
        (1, t0 + dt.timedelta(seconds=12), 101, "shop:order:paid", 99.95, None),
        (2, t0 + dt.timedelta(seconds=3), 102, "shop:order:placed", 240.00, None),
        (3, t0 + dt.timedelta(seconds=7), 103, "shop:order:placed", 18.50, None),
        (4, t0 + dt.timedelta(minutes=9), 103, "shop:order:paid", 18.50, None),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )

    rules = [
        sequence_rule(
            "pay_check",
            ["shop:order:placed", "shop:order:paid"],
            key="user_id",
            timeout="PT20S",
        ),
        match_single("reminder", ["pay_check:timeout"], key="user_id"),
    ]

    emissions = chain_correlate(events, rules, max_depth=3)
    emissions.orderBy("fire_ts", "rule").show(truncate=False)

    emails: list[dict] = []
    dispatcher = ActionDispatcher()
    dispatcher.register(
        "send_payment_reminder_email",
        fn=lambda batch: emails.extend(batch),
        schema={"key": str},
        rules=["reminder"],
    )
    dispatcher(emissions)

    for e in emails:
        print(f"reminder email -> customer {e['key']} (deadline was {e['fire_ts']})")
    assert sorted(e["key"] for e in emails) == ["102", "103"]
    print("ok")


if __name__ == "__main__":
    main()
