"""Extended known-format library — the reference's full 53-name surface.

The behavioral contract comes from the reference's format registry
(src/event/format/known_schema.rs:30-70 loading resources/formats.json):
each format name maps to one or more named-capture regex variants and a
field vocabulary. The patterns below are authored fresh against the
PUBLIC log formats these names denote (Apache/nginx access logs, AWS
ELB/ALB/S3 access logs, RFC3164/5424 syslog, VMware hostd/vmkernel,
CUPS, dpkg, HAProxy, uWSGI, ZooKeeper, kubernetes klog, Redis,
PostgreSQL, Rails, OpenStack, sudo, strace, ...): same format names,
same field vocabulary, our own regexes.

Variants are tried in order by `SchemaDefinition.check_or_extract`;
first match wins (same engine as `known_formats.EventProcessor`).
Formats whose upstream definition is fields-only (web_robot_log)
register with pattern=None — the fields-already-present verification
path still applies.
"""

from __future__ import annotations

# name -> list of (pattern | None, fields)
FORMATS: dict[str, list[tuple[str | None, set[str]]]] = {
    # Apache/common access log: combined then plain CLF
    "access_log": [
        (
            r'^(?P<c_ip>\S+) \S+ (?P<cs_username>\S+) \[(?P<timestamp>[^\]]+)\] '
            r'"(?P<cs_method>\w+) (?P<cs_uri_stem>[^?\s"]+)(?:\?(?P<cs_uri_query>[^\s"]*))? '
            r'(?P<cs_version>[^"]+)" (?P<sc_status>\d{3}) (?P<sc_bytes>\d+|-) '
            r'"(?P<cs_referer>[^"]*)" "(?P<cs_user_agent>[^"]*)"(?P<body>.*)$',
            {"c_ip", "cs_username", "timestamp", "cs_method", "cs_uri_stem",
             "cs_uri_query", "cs_version", "sc_status", "sc_bytes",
             "cs_referer", "cs_user_agent", "body"},
        ),
        (
            r'^(?P<c_ip>\S+) \S+ (?P<cs_username>\S+) \[(?P<timestamp>[^\]]+)\] '
            r'"(?P<cs_method>\w+) (?P<cs_uri_stem>[^?\s"]+)(?:\?(?P<cs_uri_query>[^\s"]*))?'
            r'[^"]*" (?P<sc_status>\d{3})(?P<body>.*)$',
            {"c_ip", "cs_username", "timestamp", "cs_method", "cs_uri_stem",
             "cs_uri_query", "sc_status", "body"},
        ),
    ],
    # AWS Application Load Balancer access log
    "alb_log": [
        (
            r'^(?P<type>\S+) (?P<timestamp>\S+) (?P<elb>\S+) '
            r'(?P<client_ip>[\d.]+):(?P<client_port>\d+) '
            r'(?:(?P<target_ip>[\d.]+):(?P<target_port>\d+)|-) '
            r'(?P<request_processing_time>-?[\d.]+) (?P<target_processing_time>-?[\d.]+) '
            r'(?P<response_processing_time>-?[\d.]+) (?P<elb_status_code>\d+|-) '
            r'(?P<target_status_code>\d+|-) (?P<received_bytes>\d+) (?P<sent_bytes>\d+) '
            r'"(?P<cs_method>\S+) (?P<cs_uri_whole>\S+) (?P<cs_version>[^"]*)" '
            r'"(?P<user_agent>[^"]*)" (?P<ssl_cipher>\S+) (?P<ssl_protocol>\S+) '
            r'(?P<target_group_arn>\S+) "(?P<trace_id>[^"]*)" "(?P<domain_name>[^"]*)" '
            r'"(?P<chosen_cert_arn>[^"]*)" \S+ (?P<request_creation_time>\S+) '
            r'"(?P<action_executed>[^"]*)" "(?P<redirect_url>[^"]*)".*$',
            {"type", "timestamp", "elb", "client_ip", "client_port", "target_ip",
             "target_port", "request_processing_time", "target_processing_time",
             "response_processing_time", "elb_status_code", "target_status_code",
             "received_bytes", "sent_bytes", "cs_method", "cs_uri_whole",
             "cs_version", "user_agent", "ssl_cipher", "ssl_protocol",
             "target_group_arn", "trace_id", "domain_name", "chosen_cert_arn",
             "request_creation_time", "action_executed", "redirect_url"},
        ),
    ],
    # ctime-stamped free-text block
    "block_log": [
        (
            r'^(?P<timestamp>\w{3} \w{3}\s+\d{1,2} \d{2}:\d{2}:\d{2} \d{4})'
            r'(?:\s+(?P<body>.*))?$',
            {"timestamp", "body"},
        ),
    ],
    # Candlepin (java, MDC req/org)
    "candlepin_log": [
        (
            r'^(?P<timestamp>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3}) '
            r'(?:\[thread=[^\]]*\] )?\[req=(?P<req>[^,\]]*), org=(?P<org>[^\]]*)\] '
            r'(?P<alert_level>\w+)\s+(?P<module>\S+) - (?P<body>.*)$',
            {"timestamp", "req", "org", "alert_level", "module", "body"},
        ),
        (
            r'^(?P<timestamp>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3}) (?P<body>.*)$',
            {"timestamp", "body"},
        ),
    ],
    "choose_repo_log": [
        (
            r'^(?P<timestamp>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3}) - '
            r'(?P<level>\w+) - (?P<body>.*)$',
            {"timestamp", "level", "body"},
        ),
    ],
    "cloudvm_ram_log": [
        (
            r'^(?P<timestamp>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3})\s+(?P<body>.*)$',
            {"timestamp", "body"},
        ),
    ],
    # CUPS error_log
    "cups_log": [
        (
            r'^(?P<level>[A-Z]) \[(?P<timestamp>[^\]]+)\] \[(?P<section>[^\]]+)\] (?P<body>.*)$',
            {"level", "timestamp", "section", "body"},
        ),
        (
            r'^(?P<level>[A-Z]) \[(?P<timestamp>[^\]]+)\] (?P<body>.*)$',
            {"level", "timestamp", "body"},
        ),
    ],
    # dpkg.log: "status <state> pkg ver" / "<action> pkg ver [ver]" / fallback
    "dpkg_log": [
        (
            r'^(?P<timestamp>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}) status '
            r'(?P<status>\S+) (?P<package>\S+) (?P<installed_version>\S+)$',
            {"timestamp", "status", "package", "installed_version"},
        ),
        (
            r'^(?P<timestamp>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}) '
            r'(?P<action>install|upgrade|configure|trigproc|remove|purge) '
            r'(?P<package>\S+) (?P<installed_version>\S+)(?: (?P<available_version>\S+))?$',
            {"timestamp", "action", "package", "installed_version", "available_version"},
        ),
        (
            r'^(?P<timestamp>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}) (?P<body>.*)$',
            {"timestamp", "body"},
        ),
    ],
    # AWS Classic ELB access log
    "elb_log": [
        (
            r'^(?P<timestamp>\S+) (?P<elb>\S+) (?P<client_ip>[\d.]+):(?P<client_port>\d+) '
            r'(?:(?P<backend_ip>[\d.]+):(?P<backend_port>\d+)|-) '
            r'(?P<request_processing_time>-?[\d.]+) (?P<backend_processing_time>-?[\d.]+) '
            r'(?P<response_processing_time>-?[\d.]+) (?P<elb_status_code>\d+|-) '
            r'(?P<backend_status_code>\d+|-) (?P<received_bytes>\d+) (?P<sent_bytes>\d+) '
            r'"(?P<cs_method>\S+) (?P<cs_uri_stem>[^?\s"]+)(?:\?(?P<cs_uri_query>[^\s"]*))? '
            r'(?P<cs_version>[^"]*)" "(?P<user_agent>[^"]*)" '
            r'(?P<ssl_cipher>\S+) (?P<ssl_protocol>\S+)(?P<body>.*)$',
            {"timestamp", "elb", "client_ip", "client_port", "backend_ip",
             "backend_port", "request_processing_time", "backend_processing_time",
             "response_processing_time", "elb_status_code", "backend_status_code",
             "received_bytes", "sent_bytes", "cs_method", "cs_uri_stem",
             "cs_uri_query", "cs_version", "user_agent", "ssl_cipher",
             "ssl_protocol", "body"},
        ),
    ],
    # oVirt engine.log
    "engine_log": [
        (
            r'^(?P<timestamp>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3}) '
            r'(?P<level>\w+)\s+\[(?P<logger>[^\]]+)\] \((?P<tid>[^)]+)\) (?P<body>.*)$',
            {"timestamp", "level", "logger", "tid", "body"},
        ),
    ],
    # Rust env_logger
    "env_logger_log": [
        (
            r'^\[(?P<timestamp>[^ \]]+) (?P<level>\w+)\s+(?P<module>[^\]]+)\] (?P<body>.*)$',
            {"timestamp", "level", "module", "body"},
        ),
    ],
    # Apache error log (2.4 detailed, then 2.2 simple)
    "error_log": [
        (
            r'^\[(?P<timestamp>[^\]]+)\] \[(?:(?P<module>\w+):)?(?P<level>\w+)\] '
            r'\[pid (?P<pid>\d+)(?::tid (?P<tid>\d+))?\]'
            r'(?: \[client (?P<c_ip>[\d.:a-fA-F]+):(?P<c_port>\d+)\])? (?P<body>.*)$',
            {"timestamp", "module", "level", "pid", "tid", "c_ip", "c_port", "body"},
        ),
        (
            r'^\[(?P<timestamp>[^\]]+)\] \[(?P<level>\w+)\] (?P<body>.*)$',
            {"timestamp", "level", "body"},
        ),
    ],
    # ESXi syslog (hostd et al. via syslog)
    "esx_syslog_log": [
        (
            r'^(?:<(?P<syslog_pri>\d+)>)?(?P<timestamp>\S+) \S+ '
            r'(?P<log_syslog_tag>[\w-]+): (?P<level>\w+) (?P<log_procname>[\w-]+)'
            r'\[(?P<log_pid>\d+)\](?: \[Originator@\S+(?: sub=(?P<logger>[^\s\]]+))?'
            r'(?: opID=(?P<opid>[^\s\]]+))?[^\]]*\])? (?P<body>.*)$',
            {"syslog_pri", "timestamp", "log_syslog_tag", "level", "log_procname",
             "log_pid", "logger", "opid", "body"},
        ),
    ],
    # HAProxy syslog: HTTP format, then proxy-started notice
    "haproxy_log": [
        (
            r'^(?P<timestamp>\w{3}\s+\d{1,2} \d{2}:\d{2}:\d{2}) (?P<logging_host>\S+) '
            r'(?P<process_name>[\w-]+)\[(?P<pid>\d+)\]: '
            r'(?P<client_ip>[\d.]+):(?P<client_port>\d+) \[(?P<accept_date>[^\]]+)\] '
            r'(?P<frontend_name>[\w.~-]+) (?P<backend_name>[\w.-]+)/(?P<server_name>\S+) '
            r'(?P<tq>-?\d+)/(?P<tw>-?\d+)/(?P<tc>-?\d+)/(?P<tr>-?\d+)/(?P<tt>-?\d+) '
            r'(?P<status_code>\d+|-1) (?P<bytes_read>\d+) '
            r'(?P<captured_request_cookie>\S+) (?P<captured_response_cookie>\S+) '
            r'(?P<termination_state>\S+) '
            r'(?P<actconn>\d+)/(?P<feconn>\d+)/(?P<beconn>\d+)/(?P<srv_conn>\d+)/(?P<retries>\d+) '
            r'(?P<srv_queue>\d+)/(?P<backend_queue>\d+)'
            r'(?: \{(?P<captured_request_headers>[^}]*)\})?'
            r'(?: \{(?P<captured_response_headers>[^}]*)\})? '
            r'"(?P<http_method>\S+) (?P<http_url>\S+)(?: (?P<http_version>[^"]*))?"$',
            {"timestamp", "logging_host", "process_name", "pid", "client_ip",
             "client_port", "accept_date", "frontend_name", "backend_name",
             "server_name", "tq", "tw", "tc", "tr", "tt", "status_code",
             "bytes_read", "captured_request_cookie", "captured_response_cookie",
             "termination_state", "actconn", "feconn", "beconn", "srv_conn",
             "retries", "srv_queue", "backend_queue", "captured_request_headers",
             "captured_response_headers", "http_method", "http_url", "http_version"},
        ),
        (
            r'^(?P<timestamp>\w{3}\s+\d{1,2} \d{2}:\d{2}:\d{2}) (?P<logging_host>\S+) '
            r'(?P<process_name>[\w-]+)\[(?P<pid>\d+)\]: Proxy (?P<frontend_name>\S+) started\.$',
            {"timestamp", "logging_host", "process_name", "pid", "frontend_name"},
        ),
    ],
    "katello_log": [
        (
            r'^(?P<timestamp>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}) '
            r'\[(?P<alert_level>\w)\] \[(?P<module>[^\]]*)\] (?P<message>.*)$',
            {"timestamp", "alert_level", "module", "message"},
        ),
    ],
    # lnav's own debug log
    "lnav_debug_log": [
        (
            r'^(?P<timestamp>\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}) '
            r'(?P<level>[TDIWEF]) (?P<thread>\S+) (?P<srcfile>[\w./-]+):(?P<srcline>\d+) '
            r'(?P<body>.*)$',
            {"timestamp", "level", "thread", "srcfile", "srcline", "body"},
        ),
    ],
    "nextflow_log": [
        (
            r'^(?P<timestamp>\w{3}-\d{2} \d{2}:\d{2}:\d{2}\.\d{3}) \[(?P<thread>[^\]]+)\] '
            r'(?P<level>\w+)\s+(?P<module>\S+) - (?P<body>.*)$',
            {"timestamp", "thread", "level", "module", "body"},
        ),
    ],
    # OpenAM tab-separated audit log
    "openam_log": [
        (
            r'^"(?P<timestamp>[^"]+)"\t+(?P<data>[^\t]*)\t+(?P<loginid>[^\t]*)\t+'
            r'(?P<contextid>[^\t]*)\t+(?P<ipaddr>[^\t]*)\t+(?P<level>[^\t]*)\t+'
            r'(?P<domain>[^\t]*)\t+(?P<loggedby>[^\t]*)\t+(?P<messageid>[^\t]*)\t+'
            r'(?P<modulename>[^\t]*)\t+(?P<nameid>[^\t]*)\t+(?P<hostname>[^\t]*)$',
            {"timestamp", "data", "loginid", "contextid", "ipaddr", "level",
             "domain", "loggedby", "messageid", "modulename", "nameid", "hostname"},
        ),
    ],
    "openamdb_log": [
        (
            r'^(?P<module>\w+): (?P<timestamp>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(?:\.\d+)?): '
            r'Thread\[(?P<thread>[^\]]+)\]:? ?(?P<body>.*)$',
            {"module", "timestamp", "thread", "body"},
        ),
    ],
    "openstack_log": [
        (
            r'^(?P<timestamp>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{3}) (?P<pid>\d+) '
            r'(?P<level>\w+) (?P<logger>\S+) (?:\[(?P<tid>[^\]]*)\] )?(?P<body>.*)$',
            {"timestamp", "pid", "level", "logger", "tid", "body"},
        ),
        (
            r'^(?P<timestamp>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{3}) '
            r'(?P<level>[A-Z]+) (?P<logger>\S+) (?P<body>.*)$',
            {"timestamp", "level", "logger", "body"},
        ),
    ],
    # CUPS page_log
    "page_log": [
        (
            r'^(?P<printer>\S+) (?P<username>\S+) (?P<job_id>\d+) \[(?P<timestamp>[^\]]+)\] '
            r'(?P<page_number>\S+) (?P<num_copies>\d+) (?P<job_billing>\S+)'
            r'(?: (?P<job_originating_hostname>\S+))?(?P<body>.*)$',
            {"printer", "username", "job_id", "timestamp", "page_number",
             "num_copies", "job_billing", "job_originating_hostname", "body"},
        ),
    ],
    "procstate_log": [
        (
            r'^(?P<timestamp>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2})\s--\s(?P<body>.*)$',
            {"timestamp", "body"},
        ),
    ],
    # Proxifier connection log
    "proxifier_log": [
        (
            r'^\[(?P<timestamp>\d{2}\.\d{2} \d{2}:\d{2}:\d{2})\] (?P<app_name>\S+)'
            r'(?: \((?P<app_pid>\d+)\))?(?: (?P<level>\w+):)? - '
            r'(?P<target_host>[\w.-]+):(?P<target_port>\d+) (?P<body>.*)$',
            {"timestamp", "app_name", "app_pid", "level", "target_host",
             "target_port", "body"},
        ),
    ],
    # Ruby ::Logger default format (+ optional request id)
    "rails_log": [
        (
            r'^(?P<level_char>[DIWEFAU]), \[(?P<timestamp>[^ \]]+) #(?P<pid>\d+)\]\s+'
            r'(?P<level>\w+) -- (?P<module>[^:]*): (?:\[(?P<reqid>[^\]]+)\] )?(?P<body>.*)$',
            {"level_char", "timestamp", "pid", "level", "module", "reqid", "body"},
        ),
    ],
    # Redis server log: 3.x+ ("pid:role d Mon yyyy hh:mm:ss.mmm lvl body"), then 2.x
    "redis_log": [
        (
            r'^(?P<pid>\d+):(?P<role>[XCSM]) (?P<timestamp>\d{1,2} \w{3} \d{4} '
            r'\d{2}:\d{2}:\d{2}\.\d{3}) (?P<level>[-.*#]) (?P<body>.*)$',
            {"pid", "role", "timestamp", "level", "body"},
        ),
        (
            r'^\[(?P<pid>\d+)\] (?P<timestamp>\d{1,2} \w{3} \d{2}:\d{2}:\d{2}\.\d{3}) '
            r'(?P<level>[-.*#]) (?P<body>.*)$',
            {"pid", "timestamp", "level", "body"},
        ),
    ],
    # S3 server access log
    "s3_log": [
        (
            r'^(?P<owner>\S+) (?P<bucket>\S+) \[(?P<timestamp>[^\]]+)\] (?P<c_ip>[\d.]+) '
            r'(?P<cs_userid>\S+) (?P<req_id>\S+) (?P<op>\S+) (?P<cs_key>\S+) '
            r'"(?P<cs_method>\S+) (?P<cs_uri_stem>[^?\s"]+)(?:\?(?P<cs_uri_query>[^\s"]*))? '
            r'?(?P<cs_version>[^"]*)" (?P<sc_status>\d+|-) (?P<sc_error_code>\S+) '
            r'(?P<sc_bytes>\d+|-) (?P<obj_size>\d+|-) (?P<total_time>\d+|-) '
            r'(?P<turn_around_time>\d+|-) "(?P<cs_referer>[^"]*)" "(?P<cs_user_agent>[^"]*)"'
            r'(?: (?P<version_id>\S+))?.*$',
            {"owner", "bucket", "timestamp", "c_ip", "cs_userid", "req_id", "op",
             "cs_key", "cs_method", "cs_uri_stem", "cs_uri_query", "cs_version",
             "sc_status", "sc_error_code", "sc_bytes", "obj_size", "total_time",
             "turn_around_time", "cs_referer", "cs_user_agent", "version_id"},
        ),
    ],
    # Rust simple_logger / simplelog
    "simple_rs_log": [
        (
            r'^(?P<timestamp>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}[,.]\d+) '
            r'(?P<level>\w+)\s+\[(?P<module>[^\]]+)\] (?P<body>.*)$',
            {"timestamp", "level", "module", "body"},
        ),
    ],
    "snaplogic_log": [
        (
            r'^(?P<timestamp>\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}[.,]\d{3}) '
            r'(?P<level>\w+)\s+(?P<invoker>\S+) (?P<logger>\S+) - (?P<body>.*)$',
            {"timestamp", "level", "invoker", "logger", "body"},
        ),
    ],
    # SSSD debug log
    "sssd_log": [
        (
            r'^\((?P<timestamp>[^)]+)\) \[(?P<service>\w+)'
            r'(?:\[(?P<module>[^\]]+(?:\[[^\]]*\])?)\])?\] \[(?P<function>[^\]]+)\] '
            r'\((?P<debug_level>0x[0-9a-fA-F]+)\): (?P<body>.*)$',
            {"timestamp", "service", "module", "function", "debug_level", "body"},
        ),
    ],
    # strace -tt -T output
    "strace_log": [
        (
            r'^(?P<timestamp>\d{2}:\d{2}:\d{2}(?:\.\d+)?) (?P<syscall>\w+)'
            r'\((?P<body>.*)\)\s+= (?P<rc>-?\d+|\?)'
            r'(?: (?P<errno>E[A-Z]+) \([^)]*\))?(?: <(?P<duration>[\d.]+)>)?$',
            {"timestamp", "syscall", "body", "rc", "errno", "duration"},
        ),
    ],
    # sudo auth log fragment (no timestamp of its own)
    "sudo_log": [
        (
            r'^\s*(?P<login>\S+) : (?:(?P<error_msg>[^;]+?) ; )?TTY=(?P<tty>\S+) ; '
            r'PWD=(?P<pwd>[^;]+?) ; USER=(?P<user>\S+) ; COMMAND=(?P<command>.*)$',
            {"login", "error_msg", "tty", "pwd", "user", "command"},
        ),
    ],
    # RFC3164 then RFC5424 syslog
    "syslog_log": [
        (
            r'^(?P<timestamp>\w{3}\s+\d{1,2} \d{2}:\d{2}:\d{2}) (?P<log_hostname>\S+) '
            r'(?P<log_syslog_tag>(?P<log_procname>[\w./-]+)(?:\[(?P<log_pid>\d+)\])?): '
            r'(?P<body>.*)$',
            {"timestamp", "log_hostname", "log_syslog_tag", "log_procname",
             "log_pid", "body"},
        ),
        (
            r'^<(?P<log_pri>\d+)>(?P<syslog_version>\d+) (?P<timestamp>\S+) '
            r'(?P<log_hostname>\S+) (?P<log_procname>\S+) (?P<log_pid>\S+) '
            r'(?P<log_msgid>\S+) (?P<log_struct>-|\[.*\]) ?(?P<body>.*)$',
            {"log_pri", "syslog_version", "timestamp", "log_hostname",
             "log_procname", "log_pid", "log_msgid", "log_struct", "body"},
        ),
    ],
    # Target Communication Framework channel trace
    "tcf_log": [
        (
            r'^(?P<timestamp>\d{2}:\d{2}:\d{2}\.\d{3}): (?P<name>\S+) '
            r'(?P<dir>--->|<---) (?P<type>[CERNPF])(?: (?P<token>\S+))?'
            r'(?: (?P<service>\w+))?(?: (?P<msg>\S+))?(?: (?P<body>.*))?$',
            {"timestamp", "name", "dir", "type", "token", "service", "msg", "body"},
        ),
    ],
    # tcsh ~/.history ("#+<epoch>\n<command>")
    "tcsh_history": [
        (
            r'^#\+(?P<timestamp>\d+)(?:\n(?P<body>.*))?$',
            {"timestamp", "body"},
        ),
    ],
    # uWSGI request log
    "uwsgi_log": [
        (
            r'^\[pid: (?P<s_pid>\d+)\|app: (?P<s_app>\d+)\|req: '
            r'(?P<s_req>\d+)/(?P<s_worker_reqs>\d+)\] (?P<c_ip>\S+) '
            r'\((?P<cs_username>[^)]*)\) \{(?P<cs_vars>\d+) vars in (?P<cs_bytes>\d+) '
            r'bytes\} \[(?P<timestamp>[^\]]+)\] (?P<cs_method>\S+) '
            r'(?P<cs_uri_stem>[^?\s]+)(?:\?(?P<cs_uri_query>\S*))? => generated '
            r'(?P<sc_bytes>\d+) bytes in (?P<s_runtime>\d+) (?P<rt_unit>\w+) '
            r'\((?P<cs_version>\S+) (?P<sc_status>\d+)\) (?P<sc_headers>\d+) headers in '
            r'(?P<sc_header_bytes>\d+) bytes \((?P<s_switches>\d+) switches on core '
            r'(?P<s_core>\d+)\)(?P<body>.*)$',
            {"s_pid", "s_app", "s_req", "s_worker_reqs", "c_ip", "cs_username",
             "cs_vars", "cs_bytes", "timestamp", "cs_method", "cs_uri_stem",
             "cs_uri_query", "sc_bytes", "s_runtime", "rt_unit", "cs_version",
             "sc_status", "sc_headers", "sc_header_bytes", "s_switches",
             "s_core", "body"},
        ),
    ],
    # VMware vmkernel log
    "vmk_log": [
        (
            r'^(?:<(?P<syslog_pri>\d+)>)?(?P<timestamp>\S+) cpu(?P<cpu>\d+):'
            r'(?P<world_id>\d+)(?:\s+opID=(?P<opid>\S+))?\)'
            r'(?:(?P<level>WARNING|ALERT|ERROR|INFO): )?'
            r'(?:(?P<subsystem>\w+): )?(?P<body>.*)$',
            {"syslog_pri", "timestamp", "cpu", "world_id", "opid", "level",
             "subsystem", "body"},
        ),
    ],
    # VMware hostd/vpxa: bracketed header, then journald-style
    "vmw_log": [
        (
            r"^(?P<timestamp>\S+) \[(?P<tid>[0-9A-Fa-f]+) (?P<level>\w+) "
            r"'(?P<prc>[^']+)'(?: opID=(?P<opid>[^\s\]]+))?"
            r"(?: user=(?P<user>[^\s\]]+))?\] (?P<body>.*)$",
            {"timestamp", "tid", "level", "prc", "opid", "user", "body"},
        ),
        (
            r'^(?P<timestamp>\S+) (?P<level>\w+) (?P<prc>[\w-]+)\[(?P<tid>\d+)\] '
            r'\[Originator@\S+(?: sub=(?P<comp>[^\s\]]+))?(?: opID=(?P<opid>[^\s\]]+))?'
            r'(?: user=(?P<user>[^\s\]]+))?[^\]]*\] (?P<body>.*)$',
            {"timestamp", "level", "prc", "tid", "comp", "opid", "user", "body"},
        ),
    ],
    "vmw_py_log": [
        (
            r'^(?P<timestamp>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}[,.]\d+) '
            r'(?P<pid>\d+) (?P<level>\w+) (?P<module>\S+) (?P<body>.*)$',
            {"timestamp", "pid", "level", "module", "body"},
        ),
    ],
    "vmw_vc_svc_log": [
        (
            r'^(?P<timestamp>\S+) (?P<level>\w+) (?P<module>[\w-]+) '
            r'\[(?P<srcfile>[\w.]+):(?P<srcline>\d+)\](?: \[opID=(?P<opid>[^\]]+)\])? '
            r'(?P<body>.*)$',
            {"timestamp", "level", "module", "srcfile", "srcline", "opid", "body"},
        ),
    ],
    # vCenter embedded postgres (verbose log_line_prefix)
    "vpostgres_log": [
        (
            r'^(?P<timestamp>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d+ \w+) (?P<pid>\d+) '
            r'(?:(?P<user>[^@\s]+)@(?P<db_name>\S+) )?(?:(?P<remote_pair>\S+) )?'
            r'\[(?P<num_line>\d+)(?:-\d+)?\] (?:(?P<session_id>[0-9a-f]+\.[0-9a-f]+) )?'
            r'(?:(?P<transaction_id>\d+) )?(?P<level>[A-Z]+):\s+(?P<body>.*)$',
            {"timestamp", "pid", "user", "db_name", "remote_pair", "num_line",
             "session_id", "transaction_id", "level", "body"},
        ),
    ],
    # upstream definition is fields-only (JSON events) — no pattern
    "web_robot_log": [
        (
            None,
            {"timestamp", "ip", "method", "request", "request-id", "resource",
             "response", "bytes", "referrer", "useragent"},
        ),
    ],
    # Spacewalk / Satellite xmlrpc log
    "xmlrpc_log": [
        (
            r'^(?P<timestamp>\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2} [+-]\d{2}:\d{2}) '
            r'(?P<pid>\d+) (?P<client_ip>[\d.]+): (?P<module>[\w./]+)/(?P<function>\w+)'
            r'(?:\((?P<arguments>.*)\))?(?P<body>.*)$',
            {"timestamp", "pid", "client_ip", "module", "function",
             "arguments", "body"},
        ),
    ],
    # ZooKeeper server log (log4j), then syslog-wrapped
    "zookeeper_log": [
        (
            r'^(?P<timestamp>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3}) '
            r'\[myid:(?P<myid>\d*)\] - (?P<level>\w+)\s+'
            r'\[(?P<thread>[^:\]]+):(?P<logger>[\w$.]+)@(?P<line_number>\d+)\] - '
            r'(?P<body>.*)$',
            {"timestamp", "myid", "level", "thread", "logger", "line_number", "body"},
        ),
        (
            r'^<(?P<pri>\d+)>(?P<version>\d+) (?P<timestamp>\S+) (?P<hostname>\S+) '
            r'(?P<appname>\S+) (?P<procid>\S+) (?P<msgid>\S+) '
            r'(?P<structureddata>-|\[.*\]) ?(?P<message>.*)$',
            {"pri", "version", "timestamp", "hostname", "appname", "procid",
             "msgid", "structureddata", "message"},
        ),
    ],
    # bare kubernetes klog line
    "kubernetes_log": [
        (
            r'^(?P<severity>[IWEF])(?P<month>\d{2})(?P<day>\d{2}) '
            r'(?P<time>\d{2}:\d{2}:\d{2}(?:\.\d+)?)\s+(?P<pid>\d+) '
            r'(?P<source_file>[\w.-]+):(?P<line_number>\d+)\] (?P<message>.*)$',
            {"severity", "month", "day", "time", "pid", "source_file",
             "line_number", "message"},
        ),
    ],
    "postgresql_log": [
        (
            r'^(?P<timestamp>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(?:\.\d+)? \w+) '
            r'\[(?P<process_id>\d+)\] (?P<log_level>[A-Z]+):\s+(?P<sql_statement>.*)$',
            {"timestamp", "process_id", "log_level", "sql_statement"},
        ),
    ],
    # CRI/fluentbit-wrapped Spring Boot java log
    "java": [
        (
            r'^(?P<timestamp_fb>\S+) (?P<stream>stdout|stderr) (?P<log_type>\w) '
            r'(?P<timestamp>\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}[.,]\d+)\s+'
            r'(?P<log_level>\w+) \d+ --- \[\s*(?P<thread>[^\]]*)\] (?P<logger>\S+)\s*: '
            r'(?:(?P<http_method>GET|POST|PUT|DELETE|PATCH|HEAD|OPTIONS) \S+ '
            r'HTTP/(?P<http_version>[\d.]+)(?: from (?P<client_ip>[\d.]+))?'
            r'(?: status (?P<status_code>\d+))?.*|.*)$',
            {"timestamp_fb", "stream", "log_type", "timestamp", "log_level",
             "thread", "logger", "http_method", "http_version", "client_ip",
             "status_code"},
        ),
    ],
    # ingress-nginx access log (extends the builtin combined-format definition)
    "nginx_access": [
        (
            r'^(?P<remote_addr>\S+) - (?P<remote_user>\S+) \[(?P<timestamp>[^\]]+)\] '
            r'"(?P<method>\S+) (?P<request>\S+) [^"]*" (?P<status>\d+) '
            r'(?P<body_bytes_sent>\d+) "(?P<http_referer>[^"]*)" '
            r'"(?P<http_user_agent>[^"]*)" (?P<request_length>\d+) '
            r'(?P<request_time>[\d.]+) \[(?P<proxy_upstream_name>[^\]]*)\] '
            r'\[(?P<proxy_alternative_upstream_name>[^\]]*)\] (?P<upstream_addr>\S+) '
            r'(?P<upstream_response_length>\d+) (?P<upstream_response_time>[\d.]+) '
            r'(?P<upstream_status>\d+) (?P<req_id>\w+)$',
            {"remote_addr", "remote_user", "timestamp", "method", "request",
             "status", "body_bytes_sent", "http_referer", "http_user_agent",
             "request_length", "request_time", "proxy_upstream_name",
             "proxy_alternative_upstream_name", "upstream_addr",
             "upstream_response_length", "upstream_response_time",
             "upstream_status", "req_id"},
        ),
    ],
    # CRI-wrapped postgres container log (extends builtin "postgres")
    "postgres": [
        (
            r'^(?P<timestamp_fb>\S+) (?P<stream>stdout|stderr) (?P<log_type>\w) '
            r'(?P<timestamp>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}[.,]\d+ \w+) '
            r'\[(?P<process_id>\d+)\] (?P<log_level>[A-Z]+):\s+(?P<message>.*)$',
            {"timestamp_fb", "stream", "log_type", "timestamp", "process_id",
             "log_level", "message"},
        ),
    ],
    # CRI-wrapped zookeeper container log
    "zookeeper": [
        (
            r'^(?P<timestamp_fb>\S+) (?P<stream>stdout|stderr) (?P<log_type>\w) '
            r'(?P<timestamp>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}[,.]\d+) '
            r'\[myid:(?P<myid>\d*)\] - (?P<log_level>\w+)\s+\[(?P<thread>[^\]]+)\] - '
            r'(?P<message>.*)$',
            {"timestamp_fb", "stream", "log_type", "timestamp", "myid",
             "log_level", "thread", "message"},
        ),
    ],
    # CRI-wrapped klog container line (extends builtin "klog")
    "klog": [
        (
            r'^(?P<timestamp>\S+) (?P<stream>stdout|stderr) (?P<log_type>\w) '
            r'(?P<severity>[IWEF])(?P<month>\d{2})(?P<day>\d{2}) '
            r'(?P<time>\d{2}:\d{2}:\d{2}(?:\.\d+)?)\s+(?P<pid>\d+) '
            r'(?P<source_file>[\w.-]+):(?P<line_number>\d+)\] (?P<message>.*)$',
            {"timestamp", "stream", "log_type", "severity", "month", "day",
             "time", "pid", "source_file", "line_number", "message"},
        ),
    ],
    # the reference server's own tracing output
    "parseable_server_logs": [
        (
            r'^(?P<timestamp>\S+)\s+(?P<level>\w+) (?P<logger_context>\S+) '
            r'ThreadId\((?P<thread_id>\d+)\) (?P<module>[\w:]+): '
            r'(?:[\w/.-]+:(?P<line_number>\d+):)? ?(?P<body>.*)$',
            {"timestamp", "level", "logger_context", "thread_id", "module",
             "line_number", "body"},
        ),
        (
            r'^(?P<timestamp>\S+)\s+(?P<level>\w+) (?P<module>[\w:]+): (?P<body>.*)$',
            {"timestamp", "level", "module", "body"},
        ),
    ],
    "boomi_container_log": [
        (
            r'^(?P<timestamp>\w{3} \d{1,2}, \d{4} \d{1,2}:\d{2}:\d{2} [AP]M(?: \w+)?) '
            r'(?P<level>\w+) \[(?P<logger>[^\]]+)\] (?P<body>.*)$',
            {"timestamp", "level", "logger", "body"},
        ),
    ],
    "boomi_webserver_log": [
        (
            r'^(?P<c_ip>\S+) \S+ (?P<cs_username>\S+) \[(?P<timestamp>[^\]]+)\] '
            r'"(?P<cs_method>\S+) (?P<cs_uri_stem>[^?\s"]+)(?:\?(?P<cs_uri_query>[^\s"]*))? '
            r'(?P<cs_version>[^"]*)" (?P<sc_status>\d+) (?P<sc_bytes>\d+|-) '
            r'(?P<duration>\d+)(?: "(?P<cs_referer>[^"]*)" "(?P<cs_user_agent>[^"]*)")?$',
            {"c_ip", "cs_username", "timestamp", "cs_method", "cs_uri_stem",
             "cs_uri_query", "cs_version", "sc_status", "sc_bytes", "duration",
             "cs_referer", "cs_user_agent"},
        ),
    ],
}


def register_all(processor) -> None:
    """Register every library format into an EventProcessor. For names
    that already have builtin variants (klog, nginx_access, postgres)
    the library patterns are MORE specific (CRI-wrapped / ingress
    shapes that extend the plain form), so they are inserted ahead of
    the builtins — first match wins in check_or_extract."""
    for name, variants in FORMATS.items():
        existing = name in getattr(processor, "schema_definitions", {})
        for pattern, fields in reversed(variants) if existing else variants:
            processor.add_format(name, pattern, fields, prepend=existing)
