"""Format-library coverage: every reference format name, sample-line
extraction, and field-vocabulary parity with resources/formats.json."""

import json
import os

import pytest

from parseable_spark.ingest.format_library import FORMATS
from parseable_spark.ingest.known_formats import KNOWN_SCHEMA_LIST

REFERENCE_FORMATS_JSON = "/root/reference/resources/formats.json"

# one realistic sample line per format name (authored, not copied)
SAMPLES = {
    "access_log": (
        '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] '
        '"GET /apache_pb.gif?lang=en HTTP/1.0" 200 2326 '
        '"http://ref.example/" "Mozilla/5.0"',
        {"c_ip": "127.0.0.1", "cs_uri_stem": "/apache_pb.gif",
         "cs_uri_query": "lang=en", "sc_status": "200"},
    ),
    "alb_log": (
        'http 2018-07-02T22:23:00.186641Z app/my-lb/50dc6c495c0c9188 '
        '192.168.131.39:2817 10.0.0.1:80 0.000 0.001 0.000 200 200 34 366 '
        '"GET http://www.example.com:80/ HTTP/1.1" "curl/7.46.0" - - '
        'arn:aws:elasticloadbalancing:us-east-2:123456789012:targetgroup/my-targets/73e2 '
        '"Root=1-58337262-36d228ad5d99923122bbe354" "-" "-" 0 '
        '2018-07-02T22:22:48.364000Z "forward" "-" "-" "10.0.0.1:80" "200" "-" "-"',
        {"type": "http", "elb_status_code": "200", "client_ip": "192.168.131.39",
         "cs_method": "GET", "action_executed": "forward"},
    ),
    "block_log": (
        "Wed May 29 13:55:36 2013 -- block device event",
        {"timestamp": "Wed May 29 13:55:36 2013"},
    ),
    "candlepin_log": (
        "2013-08-27 14:32:04,909 [thread=http-bio-8443-exec-1] "
        "[req=abc-123, org=acme] INFO org.candlepin.servlet.filter - Request completed",
        {"req": "abc-123", "org": "acme", "alert_level": "INFO"},
    ),
    "choose_repo_log": (
        "2013-08-27 14:32:04,909 - INFO - requesting mirrorlist",
        {"level": "INFO"},
    ),
    "cloudvm_ram_log": (
        "2013-09-03 17:15:01,570 INFO memory used: 2048MB",
        {"timestamp": "2013-09-03 17:15:01,570"},
    ),
    "cups_log": (
        "E [20/Oct/2013:13:55:36 -0700] Unable to open listen socket",
        {"level": "E", "body": "Unable to open listen socket"},
    ),
    "dpkg_log": (
        "2012-02-14 10:44:10 status half-installed base-files:amd64 6.5",
        {"status": "half-installed", "package": "base-files:amd64",
         "installed_version": "6.5"},
    ),
    "elb_log": (
        "2015-05-13T23:39:43.945958Z my-loadbalancer 192.168.131.39:2817 "
        '10.0.0.1:80 0.000073 0.001048 0.000057 200 200 0 29 '
        '"GET http://www.example.com:80/page?q=1 HTTP/1.1" "curl/7.38.0" - -',
        {"elb": "my-loadbalancer", "backend_ip": "10.0.0.1",
         "elb_status_code": "200", "cs_uri_query": "q=1"},
    ),
    "engine_log": (
        "2014-01-14 13:22:12,034 INFO  [org.ovirt.engine.core.bll.Backend] "
        "(ajp--127.0.0.1-8702-2) Running command",
        {"level": "INFO", "tid": "ajp--127.0.0.1-8702-2"},
    ),
    "env_logger_log": (
        "[2016-06-28T12:00:00Z INFO  my_crate::module] starting up",
        {"level": "INFO", "module": "my_crate::module"},
    ),
    "error_log": (
        "[Tue Oct 10 13:55:36.123456 2000] [core:error] [pid 1234:tid 5678] "
        "[client 192.168.1.1:5678] File does not exist",
        {"module": "core", "level": "error", "pid": "1234", "c_ip": "192.168.1.1"},
    ),
    "esx_syslog_log": (
        "<166>2021-02-19T08:50:21.622Z esx01.example.com Hostd: verbose "
        "hostd[2099637] [Originator@6876 sub=Vimsvc opID=abc123] Task completed",
        {"syslog_pri": "166", "log_syslog_tag": "Hostd", "level": "verbose",
         "log_pid": "2099637", "opid": "abc123"},
    ),
    "haproxy_log": (
        "Feb  6 12:14:14 localhost haproxy[14389]: 10.0.1.2:33317 "
        "[06/Feb/2009:12:14:14.655] http-in static/srv1 10/0/30/69/109 200 2750 "
        '- - ---- 1/1/1/1/0 0/0 {1wt.eu} {} "GET /index.html HTTP/1.1"',
        {"frontend_name": "http-in", "backend_name": "static",
         "server_name": "srv1", "status_code": "200", "http_method": "GET"},
    ),
    "katello_log": (
        "2013-08-27 14:32:04 [I] [katello::api] processing request",
        {"alert_level": "I", "module": "katello::api"},
    ),
    "lnav_debug_log": (
        "2013-08-27T14:32:04.909 D t-main logfile.cc:123 opening file",
        {"level": "D", "srcfile": "logfile.cc", "srcline": "123"},
    ),
    "nextflow_log": (
        "Aug-27 14:32:04.909 [main] DEBUG nextflow.cli.Launcher - $> nextflow run",
        {"thread": "main", "level": "DEBUG"},
    ),
    "openam_log": (
        '"2013-08-27 14:32:04"\tdata1\tuser1\tctx-1\t1.2.3.4\tINFO\t'
        "dc=example\tadmin\tAUTH-100\tDataStore\tuser-dn\thost1",
        {"loginid": "user1", "ipaddr": "1.2.3.4", "messageid": "AUTH-100"},
    ),
    "openamdb_log": (
        "LDAPFilterCondition: 2013-08-27 14:32:04.909: Thread[main,5,main]: "
        "filter=(objectclass=*)",
        {"module": "LDAPFilterCondition", "thread": "main,5,main"},
    ),
    "openstack_log": (
        "2013-08-27 14:32:04.909 12345 INFO nova.compute.manager "
        "[req-abc-123 user tenant] Starting instance",
        {"pid": "12345", "level": "INFO", "logger": "nova.compute.manager"},
    ),
    "page_log": (
        "DeskJet abc123 42 [20/Oct/2013:13:55:36 -0700] 1 2 billing-code "
        "host.example.com",
        {"printer": "DeskJet", "job_id": "42", "num_copies": "2"},
    ),
    "procstate_log": (
        "2013-08-27 14:32:04 -- MARK --",
        {"timestamp": "2013-08-27 14:32:04"},
    ),
    "proxifier_log": (
        "[02.19 14:58:59] chrome.exe (1234) - www.example.com:443 open through "
        "proxy 127.0.0.1:8080",
        {"app_name": "chrome.exe", "app_pid": "1234",
         "target_host": "www.example.com", "target_port": "443"},
    ),
    "rails_log": (
        "I, [2013-08-27T14:32:04.909123 #12345]  INFO -- ActiveRecord: "
        "[req-abc] Loaded user",
        {"level_char": "I", "pid": "12345", "module": "ActiveRecord",
         "reqid": "req-abc"},
    ),
    "redis_log": (
        "12345:M 27 Aug 2013 14:32:04.909 * Background saving started",
        {"pid": "12345", "role": "M", "level": "*"},
    ),
    "s3_log": (
        "79a59df900b949e5 mybucket [06/Feb/2019:00:00:38 +0000] 192.0.2.3 "
        '79a59df900b949e5 3E57427F3EXAMPLE REST.GET.VERSIONING mykey '
        '"GET /mybucket?versioning HTTP/1.1" 200 - 113 113 7 - "-" '
        '"S3Console/0.4" -',
        {"bucket": "mybucket", "op": "REST.GET.VERSIONING", "sc_status": "200",
         "cs_uri_query": "versioning"},
    ),
    "simple_rs_log": (
        "2013-08-27 14:32:04,909 INFO  [my_crate::module] starting",
        {"level": "INFO", "module": "my_crate::module"},
    ),
    "snaplogic_log": (
        "2017-06-20T01:04:49.028 INFO  main com.snaplogic.cc.Main - starting node",
        {"level": "INFO", "logger": "com.snaplogic.cc.Main"},
    ),
    "sssd_log": (
        "(Tue Aug 27 14:32:04 2013) [sssd[be[example.com]]] [sysdb_search_user] "
        "(0x0400): Searching for user",
        {"service": "sssd", "module": "be[example.com]",
         "function": "sysdb_search_user", "debug_level": "0x0400"},
    ),
    "strace_log": (
        '13:55:36.000000 open("/etc/ld.so.cache", O_RDONLY) = 3 <0.000012>',
        {"syscall": "open", "rc": "3", "duration": "0.000012"},
    ),
    "sudo_log": (
        "alice : TTY=pts/0 ; PWD=/home/alice ; USER=root ; COMMAND=/bin/ls /etc",
        {"login": "alice", "tty": "pts/0", "user": "root",
         "command": "/bin/ls /etc"},
    ),
    "syslog_log": (
        "Aug 27 14:32:04 myhost sshd[1234]: Accepted publickey for root",
        {"log_hostname": "myhost", "log_procname": "sshd", "log_pid": "1234",
         "log_syslog_tag": "sshd[1234]"},
    ),
    "tcf_log": (
        '14:32:04.909: Server1 ---> C 5 RunControl getContext "ctx1"',
        {"name": "Server1", "dir": "--->", "type": "C", "token": "5",
         "service": "RunControl"},
    ),
    "tcsh_history": (
        "#+1377613924\nls -la",
        {"timestamp": "1377613924", "body": "ls -la"},
    ),
    "uwsgi_log": (
        "[pid: 12345|app: 0|req: 1/1] 192.168.1.1 (alice) {40 vars in 600 bytes} "
        "[Tue Aug 27 14:32:04 2013] GET /path?q=1 => generated 25 bytes in 3 msecs "
        "(HTTP/1.1 200) 2 headers in 64 bytes (1 switches on core 0)",
        {"s_pid": "12345", "c_ip": "192.168.1.1", "cs_method": "GET",
         "sc_status": "200", "s_core": "0"},
    ),
    "vmk_log": (
        "2013-08-27T14:32:04.909Z cpu1:12345)WARNING: LinNet: rx poll stalled",
        {"cpu": "1", "world_id": "12345", "level": "WARNING",
         "subsystem": "LinNet"},
    ),
    "vmw_log": (
        "2013-08-27T14:32:04.909Z [7F8124A5 info 'Hostd' opID=abc123] Task created",
        {"tid": "7F8124A5", "level": "info", "prc": "Hostd", "opid": "abc123"},
    ),
    "vmw_py_log": (
        "2013-08-27 14:32:04,909 12345 INFO vmware.vsan.mgmt Starting service",
        {"pid": "12345", "level": "INFO", "module": "vmware.vsan.mgmt"},
    ),
    "vmw_vc_svc_log": (
        "2021-02-19T08:50:21.622Z info vmon [main.cpp:123] [opID=abc] starting",
        {"level": "info", "module": "vmon", "srcfile": "main.cpp",
         "srcline": "123", "opid": "abc"},
    ),
    "vpostgres_log": (
        "2021-02-19 08:50:21.622 UTC 12345 vpxd@VCDB 127.0.0.1(5432) [1] "
        "60a1b2c3.3039 987 LOG:  statement: SELECT 1",
        {"pid": "12345", "user": "vpxd", "db_name": "VCDB", "level": "LOG"},
    ),
    "xmlrpc_log": (
        "2013/08/27 14:32:04 -04:00 12345 192.168.1.1: "
        "xmlrpc/registration.welcome_message('lang: None',)",
        {"pid": "12345", "client_ip": "192.168.1.1", "function": "registration"},
    ),
    "zookeeper_log": (
        "2013-08-27 14:32:04,909 [myid:1] - INFO  [main:QuorumPeer@123] - "
        "Starting quorum peer",
        {"myid": "1", "level": "INFO", "logger": "QuorumPeer",
         "line_number": "123"},
    ),
    "kubernetes_log": (
        "I0219 08:50:21.622345 12345 controller.go:123] Starting controller",
        {"severity": "I", "month": "02", "day": "19", "pid": "12345",
         "source_file": "controller.go", "line_number": "123"},
    ),
    "postgresql_log": (
        "2021-02-19 08:50:21 UTC [12345] LOG:  statement: SELECT * FROM users",
        {"process_id": "12345", "log_level": "LOG",
         "sql_statement": "statement: SELECT * FROM users"},
    ),
    "java": (
        "2021-02-19T08:50:21.622Z stdout F 2021-02-19 08:50:21.622  INFO 1 --- "
        "[http-nio-8080-exec-1] c.e.demo.Controller : GET /api/users HTTP/1.1 "
        "from 10.0.0.1 status 200",
        {"stream": "stdout", "log_level": "INFO", "http_method": "GET",
         "client_ip": "10.0.0.1", "status_code": "200"},
    ),
    "nginx_access": (
        '192.168.1.1 - alice [19/Feb/2021:08:50:21 +0000] "GET /path HTTP/1.1" '
        '200 123 "http://ref/" "curl/7.68" 456 0.001 [default-backend-80] [] '
        "10.0.0.1:80 789 0.002 200 abc123def456",
        {"method": "GET", "proxy_upstream_name": "default-backend-80",
         "upstream_status": "200", "req_id": "abc123def456"},
    ),
    "postgres": (
        "2021-02-19T08:50:21.622Z stdout F 2021-02-19 08:50:21.622 UTC [1] "
        "LOG:  database system is ready",
        {"stream": "stdout", "process_id": "1", "log_level": "LOG"},
    ),
    "zookeeper": (
        "2021-02-19T08:50:21.622Z stdout F 2021-02-19 08:50:21,622 [myid:1] - "
        "INFO [main:Server@123] - started",
        {"stream": "stdout", "myid": "1", "log_level": "INFO"},
    ),
    "klog": (
        "2021-02-19T08:50:21.622Z stdout F I0219 08:50:21.622345 12345 "
        "controller.go:123] Starting",
        {"stream": "stdout", "severity": "I", "pid": "12345",
         "source_file": "controller.go"},
    ),
    "parseable_server_logs": (
        "2024-01-01T00:00:00.000000Z  INFO main ThreadId(01) parseable::storage: "
        "src/storage/mod.rs:100: flushed stream",
        {"level": "INFO", "logger_context": "main", "thread_id": "01",
         "module": "parseable::storage", "line_number": "100"},
    ),
    "boomi_container_log": (
        "Feb 19, 2021 8:50:21 AM UTC INFO "
        "[com.boomi.container.core.AccountManager] Account started",
        {"level": "INFO", "logger": "com.boomi.container.core.AccountManager"},
    ),
    "boomi_webserver_log": (
        '192.168.1.1 - alice [19/Feb/2021:08:50:21 +0000] '
        '"GET /ws/soap?op=x HTTP/1.1" 200 1234 56 "http://ref/" "Mozilla/5.0"',
        {"cs_method": "GET", "cs_uri_query": "op=x", "sc_status": "200",
         "duration": "56"},
    ),
    "web_robot_log": None,  # fields-only upstream: no extraction pattern
}


@pytest.mark.parametrize("name", sorted(FORMATS))
def test_sample_line_extracts(name):
    sample = SAMPLES[name]
    if sample is None:
        sd = KNOWN_SCHEMA_LIST.schema_definitions[name]
        assert all(p.pattern is None for p in sd.patterns[-1:])
        # verification path: fields already present
        rec = {f: "x" for f in FORMATS[name][0][1]}
        out = KNOWN_SCHEMA_LIST.extract_from_inline_log(rec, name)
        assert out["p_format_verified"]
        return
    line, expect = sample
    rec = {"body": line}
    out = KNOWN_SCHEMA_LIST.extract_from_inline_log(rec, name)
    assert out["p_format_verified"], f"{name}: no pattern matched {line!r}"
    for k, v in expect.items():
        assert out.get(k) == v, f"{name}.{k}: {out.get(k)!r} != {v!r}"


def test_all_reference_names_registered():
    assert len(set(FORMATS)) == 53
    missing = set(FORMATS) - set(KNOWN_SCHEMA_LIST.schema_definitions)
    assert not missing


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_FORMATS_JSON), reason="reference not present"
)
def test_field_vocabulary_subset_of_reference():
    """Every field we extract for a reference-named format is in that
    format's upstream field vocabulary (no invented names)."""
    ref = {
        f["name"]: {x for rx in f.get("regex", []) for x in rx.get("fields", [])}
        for f in json.load(open(REFERENCE_FORMATS_JSON))
    }
    assert set(FORMATS) == set(ref)
    for name, variants in FORMATS.items():
        for _, fields in variants:
            extra = fields - ref[name]
            assert not extra, f"{name}: fields not in reference vocabulary: {extra}"
