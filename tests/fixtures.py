"""Synthetic ping factory — the pytest analog of the reference's
TestUtils.scala generators (same defaults, same fixed timestamp
1460036116829920000 ns = 2016-04-07T13:35:16.829Z, TestUtils.scala:27;
the enrollment tests' expected window 13:35-13:40 confirms the UTC time).

Each builder returns a JSON string (the engine's raw `value` column);
`to_df` wraps lists of them as a single-column DataFrame, matching
the post-decode Kafka/heka shape (SURVEY §1.1).
"""

from __future__ import annotations

import json
from typing import Any

TEST_TIMESTAMP_NS = 1460036116829920000  # 2016-04-07T13:35:16.829Z


def _deep_merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def main_ping(
    experiments: dict[str, str] | None = None,
    old_style_experiment: tuple[str, str] | None = ("experiment1", "control"),
    **overrides: Any,
) -> str:
    """TestUtils.scala:111-245 defaults."""
    ping = {
        "meta": {
            "Timestamp": TEST_TIMESTAMP_NS,
            "docType": "main",
            "documentId": "main-1",
            "appName": "Firefox",
            "appVersion": "42.0",
            "appBuildId": "20170101000000",
            "normalizedChannel": "release",
            "clientId": "client1",
            "sampleId": 73.0,
            "geoCountry": "IT",
            "geoCity": "Milan",
            "submissionDate": "20170101",
        },
        "environment": {
            "build": {
                "architecture": "x86",
                "buildId": "20170101000000",
                "version": "42.0",
                "displayVersion": "42.0b1",
            },
            "system": {"os": {"name": "Linux", "version": "42"}, "isWow64": False, "memoryMB": 4136.0},
            "settings": {"locale": "it_IT", "isDefaultBrowser": True},
            "profile": {"creationDate": 16861},
            "addons": (
                {"activeExperiment": {"id": old_style_experiment[0], "branch": old_style_experiment[1]}}
                if old_style_experiment
                else {}
            ),
            "experiments": {k: {"branch": v} for k, v in (experiments or {}).items()},
        },
        "payload": {
            "info": {
                "subsessionLength": 3600,
                "subsessionCounter": 1,
                "sessionId": "sample-session-id",
                "sessionStartDate": "2018-05-30T11:00:00.0-05:00",
            },
            "histograms": {
                "BROWSER_SHIM_USAGE_BLOCKED": {"values": {"0": 1}},
                "INPUT_EVENT_RESPONSE_COALESCED_MS": {
                    "values": {"1": 1, "150": 2, "250": 3, "2500": 4, "10000": 5}
                },
            },
            "keyedHistograms": {
                "SUBPROCESS_CRASHES_WITH_DUMP": {
                    "content": {"values": {"0": 1}},
                    "gpu": {"values": {"0": 1}},
                    "plugin": {"values": {"0": 1}},
                    "gmplugin": {"values": {"0": 1}},
                },
                "SUBPROCESS_KILL_HARD": {"ShutDownKill": {"values": {"0": 1}}},
                "SEARCH_COUNTS": {"ddg.urlbar": {"values": {"0": 4, "1": 0}, "sum": 4}},
            },
            "simpleMeasurements": {"activeTicks": 275, "firstPaint": 1200},
            "processes": {},
        },
    }
    return json.dumps(_deep_merge(ping, overrides))


def crash_ping(
    startup_crash: str | None = None,
    process_type: str | None = None,
    ipc_channel_error: str | None = None,
    fennec: bool = False,
    experiments: dict[str, str] | None = None,
    old_style_experiment: tuple[str, str] | None = ("experiment1", "control"),
    **overrides: Any,
) -> str:
    """TestUtils.scala:31-108 defaults (Firefox; fennec=True applies
    the Fennec/Linux variant exercising the Android fix-up)."""
    app_name = "Fennec" if fennec else "Firefox"
    ping = {
        "meta": {
            "Timestamp": TEST_TIMESTAMP_NS,
            "docType": "crash",
            "documentId": "crash-1",
            "appName": app_name,
            "appVersion": "42.0",
            "appBuildId": "20170101000000",
            "normalizedChannel": "release",
            "clientId": "client1",
            "sampleId": 73.0,
            "geoCountry": "IT",
            "geoCity": "Milan",
            "submissionDate": "20170101",
        },
        "environment": {
            "build": {
                "architecture": "x86",
                "buildId": "20170101000000",
                "version": "42.0",
                "displayVersion": "42.0b1",
            },
            "system": {"os": {"name": "Linux", "version": "42"}},
            "addons": (
                {"activeExperiment": {"id": old_style_experiment[0], "branch": old_style_experiment[1]}}
                if old_style_experiment
                else {}
            ),
            "experiments": {k: {"branch": v} for k, v in (experiments or {}).items()},
        },
        "application": {
            "architecture": "x86",
            "buildId": "20170101000000",
            "channel": "release",
            "name": app_name,
            "version": "42.0",
            "displayVersion": "42.0b1",
            "vendor": "Mozilla",
            "platformVersion": "42.0",
        },
        "payload": {
            "crashDate": "2017-01-01",
            "processType": process_type,
            "metadata": {
                "StartupCrash": startup_crash,
                "ipc_channel_error": ipc_channel_error,
            },
            "stackTraces": {
                "crash_info": {"crashing_thread": 0, "type": "SIGSEGV", "address": "0x0"},
                "threads": [
                    {
                        "frames": [
                            {"function": "abort", "module": "libc.so"},
                            {"function": "memcpy", "module": "libc.so"},
                            {
                                "function": "mozilla::dom::Element::SetAttr(nsAtom*, nsAString const&)",
                                "module": "libxul.so",
                            },
                            {"function": "nsDocShell::LoadURI", "module": "libxul.so"},
                        ]
                    }
                ],
            },
        },
    }
    return json.dumps(_deep_merge(ping, overrides))


def core_ping(**overrides: Any) -> str:
    """TestUtils.scala:329-393 defaults (Fennec/Android)."""
    ping = {
        "meta": {
            "Timestamp": TEST_TIMESTAMP_NS,
            "docType": "core",
            "documentId": "core-1",
            "appName": "Fennec",
            "appVersion": "59.0",
            "appBuildId": "20170101000000",
            "normalizedChannel": "release",
            "clientId": "ca7fb81d-5deb-4ea6-8b74-797b8e58cfae",
            "sampleId": 22.0,
            "geoCountry": "IT",
            "submissionDate": "20170101",
        },
        "payload": {
            "arch": "arm64-v8a",
            "os": "Android",
            "osversion": "42",
            "durations": 3600,
            "seq": 1,
            "displayVersion": "59.0b1",
        },
    }
    return json.dumps(_deep_merge(ping, overrides))


def event_ping(
    events: dict[str, list[list]] | None = None,
    experiments: dict[str, str] | None = None,
    **overrides: Any,
) -> str:
    """TestUtils.scala:395-512 defaults: 1 parent event + 3 dynamic
    events (incl. a normandy enrollment)."""
    default_events = {
        "parent": [
            [123456, "activity_stream", "end", "session", "909", {"addon_version": "2018.06.22"}]
        ],
        "dynamic": [
            [224264, "uptake.remotecontent.result", "uptake", "remotesettings", "success", {"source": "blocklists/addons"}],
            [424264, "uptake.remotecontent.result", "uptake", "remotesettings", "success", {"source": "blocklists/plugins"}],
            [554879, "normandy", "enroll", "preference_study", "pref-flip-timer-speed-up-60-1443940", {"branch": "six"}],
        ],
    }
    ping = {
        "meta": {
            "Timestamp": TEST_TIMESTAMP_NS,
            "docType": "event",
            "documentId": "an_id",
            "appName": "Firefox",
            "appVersion": "62.0",
            "appBuildId": "20170101000000",
            "normalizedChannel": "release",
            "clientId": "client1",
            "sampleId": 73.0,
            "geoCountry": "IT",
            "geoCity": "Milan",
            "submissionDate": "20170101",
        },
        "environment": {
            "build": {"architecture": "x86", "buildId": "20170101000000", "version": "62.0"},
            "system": {"os": {"name": "Linux", "version": "42"}},
            "settings": {"locale": "it_IT"},
            "experiments": {k: {"branch": v} for k, v in (experiments or {}).items()},
        },
        "payload": {
            "reason": "periodic",
            "processStartTimestamp": 1530291900000,
            "sessionId": "dd302e9d-569b-4058-b7e8-02b2ff83522c",
            "subsessionId": "79a2728f-af12-4ed3-b56d-0531a03c2f26",
            "lostEventsCount": 0,
            "events": events if events is not None else default_events,
        },
    }
    return json.dumps(_deep_merge(ping, overrides))


def focus_event_ping(events: list[list] | None = None, **overrides: Any) -> str:
    """TestUtils.scala:247-330 defaults (generateFocusEventMessages).

    The engine's JSON envelope stores the mobile top-level events array
    as ``payload.mobileEvents`` (the name ``payload.events`` is the
    event-ping per-process map in the unified schema)."""
    default_events = [
        [176078022, "action", "foreground", "app"],
        [176127806, "action", "type_query", "search_bar"],
        [176151285, "action", "click", "back_button", "erase_home", {"host": "side"}],
        [176151591, "action", "background", "app", "", {"sessionLength": "1000"}],
    ]
    ping = {
        "meta": {
            "Timestamp": TEST_TIMESTAMP_NS,
            "docType": "focus-event",
            "documentId": "doc-id",
            "appName": "Focus",
            "appVersion": "1.1",
            "appBuildId": "6",
            "normalizedChannel": "release",
            "clientId": "client1",
            "sampleId": 73.0,
            "geoCountry": "CA",
            "geoCity": "Victoria",
            "submissionDate": "20170101",
        },
        "payload": {
            "v": 1,
            "seq": 162,
            "locale": "pt-CA",
            "os": "Android",
            "osversion": "23",
            "created": 1506024685632,
            "settings": {
                "pref_privacy_block_ads": "true",
                "pref_locale": "",
                "pref_privacy_block_social": "true",
                "pref_secure": "true",
                "pref_privacy_block_analytics": "true",
                "pref_search_engine": "custom",
                "pref_privacy_block_other": "false",
                "pref_default_browser": "true",
                "pref_performance_block_webfonts": "false",
                "pref_performance_block_images": "false",
                "pref_autocomplete_installed": "true",
                "pref_autocomplete_custom": "false",
            },
            "mobileEvents": events if events is not None else default_events,
        },
    }
    return json.dumps(_deep_merge(ping, overrides))


DEFAULT_FRECENCY_UPDATE = [
    1.2, 3.2, -3.1, 4.4, 0.5, 0.234, -0.98, 0.33, 0.34, 0.28, 0.302,
    0.4, -0.8, 0.25, 0.9, -0.8, 0.29, 0.42, 0.89, 0.39, 0.54, 0.78,
]


def frecency_update_ping(
    study_variation: str = "model1",
    model_version: int = 140,
    loss: float = 291989.21,
    update: list[float] | None = None,
    **overrides: Any,
) -> str:
    """TestUtils.scala:514-593 defaults (generateFrecencyUpdateMessages)."""
    ping = {
        "meta": {
            "Timestamp": TEST_TIMESTAMP_NS,
            "docType": "frecency-update",
            "documentId": "an_id",
            "appName": "Firefox",
            "appVersion": "42.0",
            "appBuildId": "20170101000000",
            "normalizedChannel": "release",
            "clientId": "client1",
            "sampleId": 73.0,
            "geoCountry": "IT",
            "submissionDate": "20170101",
        },
        "payload": {
            "model_version": model_version,
            "frecency_scores": [38223.0, 3933.4, 304933.3, 21.0],
            "loss": loss,
            "update": update if update is not None else DEFAULT_FRECENCY_UPDATE,
            "num_suggestions_displayed": 1,
            "rank_selected": 0,
            "bookmark_and_history_num_suggestions_displayed": 1,
            "bookmark_and_history_rank_selected": 0,
            "num_key_down_events_at_selecteds_first_entry": 8,
            "num_key_down_events": 14,
            "time_start_interaction": 0,
            "time_end_interaction": 2275,
            "time_at_selecteds_first_entry": 1458,
            "search_string_length": 13,
            "selected_style": "autofill heuristic",
            "study_variation": study_variation,
            "study_addon_version": "1.0.2",
        },
    }
    return json.dumps(_deep_merge(ping, overrides))


def to_df(spark, pings: list[str]):
    return spark.createDataFrame([(p,) for p in pings], "value string")


def rocket_event_ping(events: list[list] | None = None, **overrides: Any) -> str:
    """focus-event/Zerda (Rocket) ping — Focus envelope with the Rocket
    settings set (RocketEvent.scala:50-61)."""
    base = json.loads(focus_event_ping(events))
    base["meta"]["appName"] = "Zerda"
    base["payload"]["settings"] = {
        "pref_search_engine": "google",
        "pref_privacy_turbo_mode": "true",
        "pref_performance_block_images": "false",
        "pref_default_browser": "true",
        "pref_save_downloads_to": "/sdcard",
        "pref_webview_version": "68.0",
        "install_referrer": "utm_source=gp",
        "experiment_name": "exp-a",
        "experiment_bucket": "2",
        "pref_locale": "zh-TW",
        "pref_key_s_tracker_token": "tok",
    }
    return json.dumps(_deep_merge(base, overrides))


def fire_tv_event_ping(events: list[list] | None = None, **overrides: Any) -> str:
    """mobile-event/FirefoxForFireTV ping (FireTvEventPing.scala:50-55)."""
    base = json.loads(focus_event_ping(events))
    base["meta"]["docType"] = "mobile-event"
    base["meta"]["appName"] = "FirefoxForFireTV"
    base["payload"]["locale"] = "en-US"
    base["payload"]["settings"] = {
        "tracking_protection_enabled": "true",
        "total_home_tile_count": "7",
        "custom_home_tile_count": "3",
        "remote_control_name": "Fire TV Remote",
        "app_id": "firetv-app",
    }
    return json.dumps(_deep_merge(base, overrides))


def mobile_event_ping(events: list[list] | None = None, **overrides: Any) -> str:
    """mobile-event/Fennec ping (MobileEvent.scala:64-83) — iOS-style
    dotted settings keys."""
    base = json.loads(focus_event_ping(events))
    base["meta"]["docType"] = "mobile-event"
    base["meta"]["appName"] = "Fennec"
    base["payload"]["os"] = "iOS"
    base["payload"]["osversion"] = "11.4"
    base["payload"]["arch"] = "arm64"
    base["payload"]["device"] = "iPhone10,4"
    base["payload"]["locale"] = "en-US"
    base["payload"]["settings"] = {
        "defaultSearchEngine": "google",
        "prefKeyAutomaticSliderValue": "0.44",
        "prefKeyAutomaticSwitchOnOff": "true",
        "prefKeyThemeName": "normal",
        "profile.ASBookmarkHighlightsVisible": "true",
        "profile.ASPocketStoriesVisible": "false",
        "profile.ASRecentHighlightsVisible": "true",
        "profile.blockPopups": "true",
        "profile.prefkey.trackingprotection.enabled": "basic",
        "profile.prefkey.trackingprotection.normalbrowsing": "on",
        "profile.prefkey.trackingprotection.privatebrowsing": "on",
        "profile.prefkey.trackingprotection.strength": "strict",
        "profile.saveLogins": "true",
        "profile.settings.closePrivateTabs": "false",
        "profile.show-translation": "true",
        "profile.showClipboardBar": "false",
        "windowHeight": "0.0",
        "windowWidth": "0.0",
    }
    return json.dumps(_deep_merge(base, overrides))
