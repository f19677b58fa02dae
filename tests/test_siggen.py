"""Native siggen (P26) unit tests: the fx-crash-sig algorithm shape —
frame naming, C++ normalization, irrelevant/prefix walks, tolerant
JSON entry point."""

import json

from telemetry_streaming_spark.functions import siggen


def _st(frames, crashing_thread=0):
    return {
        "crash_info": {"crashing_thread": crashing_thread, "type": "SIGSEGV"},
        "threads": [{"frames": frames}],
    }


def test_normalize_function_templates_and_args():
    assert (
        siggen.normalize_function(
            "nsTArray<mozilla::dom::Element*>::AppendElement(mozilla::dom::Element*)"
        )
        == "nsTArray<T>::AppendElement"
    )
    # nested templates collapse to one <T>
    assert (
        siggen.normalize_function("mozilla::Maybe<nsTArray<int> >::ref()")
        == "mozilla::Maybe<T>::ref"
    )
    assert (
        siggen.normalize_function("`anonymous namespace'::Helper(int)")
        == "(anonymous namespace)::Helper"
    )


def test_frame_name_fallbacks():
    assert siggen.frame_name({"function": "foo(int)"}) == "foo"
    assert siggen.frame_name({"module": "xul.dll", "module_offset": "0x1234"}) == "xul.dll@0x1234"
    assert siggen.frame_name({"ip": "0xdeadbeef"}) == "@0xdeadbeef"
    assert siggen.frame_name({}) == "@unknown"


def test_signature_skips_irrelevant_and_collects_prefixes():
    frames = [
        {"function": "RaiseException"},
        {"function": "abort"},
        {"function": "memcpy"},
        {"function": "free"},
        {"function": "mozilla::ipc::FatalError(char const*, bool)"},
        {"function": "ShouldNotAppear"},
    ]
    assert (
        siggen.generate_signature(_st(frames))
        == "memcpy | free | mozilla::ipc::FatalError"
    )


def test_signature_irrelevant_only_after_prelude_is_kept():
    # once a relevant frame is seen, later wait-style frames terminate
    # normally rather than being skipped
    frames = [{"function": "DoWork"}, {"function": "WaitForSingleObject"}]
    assert siggen.generate_signature(_st(frames)) == "DoWork"


def test_signature_empty_cases():
    assert siggen.generate_signature({}) == siggen.EMPTY_SIGNATURE
    assert (
        siggen.generate_signature(_st([], crashing_thread=0))
        == siggen.NO_FRAMES_SIGNATURE
    )
    assert (
        siggen.generate_signature({"crash_info": {"crashing_thread": 5}, "threads": [{}]})
        == siggen.EMPTY_SIGNATURE
    )
    # all-irrelevant stack
    assert (
        siggen.generate_signature(_st([{"function": "abort"}]))
        == siggen.NO_FRAMES_SIGNATURE
    )


def test_signature_module_offset_frames():
    frames = [{"module": "ntdll.dll", "module_offset": "0x4f6e"}, {"function": "Real"}]
    # unsymbolicated module frame is descriptive enough to terminate
    assert siggen.generate_signature(_st(frames)) == "ntdll.dll@0x4f6e"


def test_signature_from_json_tolerates_garbage():
    assert siggen.signature_from_json(None) == ""
    assert siggen.signature_from_json("") == ""
    assert siggen.signature_from_json("{not json") == ""
    assert siggen.signature_from_json(json.dumps([1, 2])) == ""
    good = json.dumps(_st([{"function": "Crashy(int)"}]))
    assert siggen.signature_from_json(good) == "Crashy"


def test_make_signature_fn_custom_rules():
    fn = siggen.make_signature_fn(irrelevant=(r"skipme",), prefix=(r"keepme",))
    st = json.dumps(_st([{"function": "skipme"}, {"function": "keepme"}, {"function": "done"}]))
    assert fn(st) == "keepme | done"
