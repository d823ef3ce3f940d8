"""Ad-hoc smoke: discovered-form login parity, engine vs simulator."""
import sys

from pyspark.sql import SparkSession

from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
from heritrix3_spark.simulator import SimConfig, simulate

LOGIN_FORM = (
    '<form method="POST" action="/j_security_check">'
    '<input type="text" name="j_username">'
    '<input type="password" name="j_password">'
    '<input type="submit" value="Log In"></form>'
)

web = {
    "http://h.example/a": [
        ("text", "seed", None, 0),
        ("link", "l", "/login.html", 1),
        ("link", "o", "/other.html", 2),
    ],
    "http://h.example/login.html": [
        ("text", "please log in", None, 0),
        ("form", LOGIN_FORM, None, 1),
        ("link", "b", "/b.html", 2),
    ],
    "http://h.example/other.html": [
        ("text", "also a login form here", None, 0),
        ("form", LOGIN_FORM, None, 1),
    ],
    "http://h.example/b.html": [("text", "b", None, 0)],
    "http://h.example/j_security_check": [
        ("text", "welcome", None, 0),
        ("link", "m", "/members.html", 1),
    ],
    "http://h.example/members.html": [("text", "secret", None, 0)],
}
kw = dict(
    forms="on",
    form_login=(("http://(example,h,", "ada", "pw123"),),
    k_per_host=1,
)
seeds = ["http://h.example/a"]
sim_log, sim_seen = simulate(web, seeds, SimConfig(**kw))
for l in sim_log:
    print("SIM", l["round"], l["ordinal"], l["canonical"], l["fetch_status"],
          l["disposition"], l.get("annotation"))

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
import tempfile

d = tempfile.mkdtemp()
eng = CrawlEngine(
    spark,
    d,
    spark.createDataFrame(
        list(web.items()),
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    ),
    CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False, **kw),
)
eng.bootstrap(seeds)
eng_log = eng.run(max_rounds=20)
rows = sorted(eng_log.collect(), key=lambda r: (r.round, r.ordinal))
for r in rows:
    print("ENG", r.round, r.ordinal, r.canonical, r.fetch_status,
          r.disposition, r.annotation)
srows = sorted(
    (l["round"], l["class_key"], l["canonical"], l["ordinal"],
     l["fetch_status"], l["disposition"], l.get("annotation"))
    for l in sim_log
)
erows = sorted(
    (r.round, r.class_key, r.canonical, r.ordinal, r.fetch_status,
     r.disposition, r.annotation)
    for r in rows
)
print("PARITY:", srows == erows)
if srows != erows:
    for a, b in zip(srows, erows):
        if a != b:
            print(" sim:", a)
            print(" eng:", b)
    sys.exit(1)
