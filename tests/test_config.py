"""Config-compiler tests — mirrors the reference's `configure` sub_test_case
(/root/reference/test/plugin/test_filter_geoip.rb:42-166)."""

import pytest

from fluent_plugin_geoip_spark.config import (
    GeoipConfig, GeoipConfigError, compile_config, parse_record_accessor,
)


def test_empty_config_ok():  # test:43-47
    compile_config(GeoipConfig(records={}))


def test_obsoleted_enable_key_rejected():  # test:49-53
    with pytest.raises(GeoipConfigError, match="obsoleted"):
        GeoipConfig.from_dict({"enable_key_city": "geoip_city"})


def test_deprecated_lookup_key_split():  # test:55-64
    cfg = GeoipConfig.from_dict({
        "geoip_lookup_key": "host,ip",
        "records": {"geoip_city": "${city['host']}"},
    })
    assert cfg.lookup_keys == ["host", "ip"]


def test_invalid_json_ruby_hash_like():  # test:66-75
    cfg = GeoipConfig(records={"invalid_json": '{"foo" => 123}'})
    with pytest.raises(GeoipConfigError, match="as json"):
        compile_config(cfg)


def test_invalid_json_unquoted_literal():  # test:77-86
    cfg = GeoipConfig(records={"invalid_json": '{"foo" : string, "bar" : 123}'})
    with pytest.raises(GeoipConfigError, match="as json"):
        compile_config(cfg)


def test_dotted_key_not_nested(caplog):  # test:88-96
    import logging
    with caplog.at_level(logging.WARNING):
        compile_config(GeoipConfig(
            lookup_keys=["host.ip"],
            records={"city": "${city.names.en['host.ip']}"}))
    assert "host.ip is not treated as nested attributes" in caplog.text


def test_nested_accessor_styles():  # test:98-116
    assert parse_record_accessor('$["host"]["ip"]') == ("host", "ip")
    assert parse_record_accessor("$['host']['ip']") == ("host", "ip")
    assert parse_record_accessor("$.host.ip") == ("host", "ip")
    assert parse_record_accessor("host.ip") == "host.ip"
    compile_config(GeoipConfig(
        lookup_keys=['$["host"]["ip"]'],
        records={"geoip_city": "${city.names.en['$[\"host\"][\"ip\"]']}"}))


def test_invalid_placeholder_rejected():  # test:118-129
    cfg = GeoipConfig(records={"geoip.city_name": '${city.names.en["host]}'})
    with pytest.raises(GeoipConfigError, match="Invalid placeholder"):
        compile_config(cfg)


@pytest.mark.parametrize("backend", ["geoip", "geoip2_compat"])
def test_unsupported_key(backend):  # test:131-142
    cfg = GeoipConfig(backend_library=backend,
                      records={"city": '${unknown["host"]}'})
    with pytest.raises(GeoipConfigError, match="unsupported key unknown"):
        compile_config(cfg)


@pytest.mark.parametrize("backend,placeholder", [
    ("geoip", '${city["host"]}'),
    ("geoip2_compat", '${city["host"]}'),
    ("geoip2_c", '${city.names.en["host"]}'),
])
def test_supported_backend(backend, placeholder):  # test:144-154
    compile_config(GeoipConfig(backend_library=backend,
                               records={"city": placeholder}))


def test_unsupported_backend():  # test:156-165
    cfg = GeoipConfig(backend_library="hive_geoip2",
                      records={"city": '${city["host"]}'})
    with pytest.raises(GeoipConfigError, match="unknown backend"):
        compile_config(cfg)


def test_placeholder_order_and_uniq():
    cfg = GeoipConfig(records={
        "a": "${city.names.en['host']},${country.iso_code['host']}",
        "b": "${city.names.en['host']}",
    })
    comp = compile_config(cfg)
    assert [p.text for p in comp.placeholders] == [
        "${city.names.en['host']}", "${country.iso_code['host']}"]


def test_quoted_template_unwrap():
    cfg = GeoipConfig(records={
        "x": "'[${location.longitude[\"host\"]},${location.latitude[\"host\"]}]'"})
    comp = compile_config(cfg)
    assert comp.templates["x"].startswith("[")
