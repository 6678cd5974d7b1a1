#!/usr/bin/env python3
"""Generate deterministic browser-profile SQLite fixtures (dev tool).

The contents are pure formulas of the row index so the Spark extraction
results can be oracle-checked with arithmetic SQL. Output goes to
src/main/resources/fixtures/ (shipped on the classpath for tests and the
browser-extraction queries).
"""
import os
import sqlite3

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "main", "resources", "fixtures")
os.makedirs(OUT, exist_ok=True)

WEBKIT_BASE = 13303449600000000  # µs since 1601 → 2022-08-19T00:00:00Z
UNIX_BASE_US = 1700000000000000
N = 20


def build(path, ddl_and_rows):
    p = os.path.join(OUT, path)
    if os.path.exists(p):
        os.remove(p)
    con = sqlite3.connect(p)
    # stable file bytes: no WAL, fixed page size
    con.execute("PRAGMA page_size=512")
    con.execute("PRAGMA journal_mode=MEMORY")
    for ddl, rows in ddl_and_rows:
        con.execute(ddl)
        if rows:
            ph = ",".join("?" * len(rows[0]))
            con.executemany(f"INSERT INTO {ddl.split()[2]} VALUES ({ph})", rows)
    con.commit()
    con.execute("VACUUM")
    con.commit()
    con.close()
    print(p, os.path.getsize(p))


# Chrome History: urls + visits + downloads + downloads_url_chains
build("chrome_history.sqlite", [
    ("CREATE TABLE urls (id INTEGER PRIMARY KEY, url TEXT, title TEXT, last_visit_time INTEGER)",
     [(i + 1, f"https://site{i}.example.com/", f"Title {i}", WEBKIT_BASE + i * 1000000)
      for i in range(N)]),
    ("CREATE TABLE visits (id INTEGER PRIMARY KEY, url INTEGER, visit_time INTEGER, transition INTEGER)",
     [(i + 1, (i % N) + 1, WEBKIT_BASE + i * 2000000, i % 12) for i in range(N)]),
    ("CREATE TABLE downloads (id INTEGER PRIMARY KEY, target_path TEXT, tab_url TEXT, start_time INTEGER, end_time INTEGER, total_bytes INTEGER, state INTEGER)",
     [(i + 1, f"/home/u/dl/file{i}.bin", f"https://tab{i}.example.com/" if i % 3 == 0 else None,
       WEBKIT_BASE + i * 3000000, WEBKIT_BASE + i * 3000000 + 500000, 1000 + i, i % 4)
      for i in range(10)]),
    ("CREATE TABLE downloads_url_chains (id INTEGER, chain_index INTEGER, url TEXT)",
     # only even download ids have a chain row at index 0 → COALESCE fallback
     [(i + 1, 0, f"https://chain{i}.example.com/get") for i in range(10) if i % 2 == 0] +
     [(i + 1, 1, f"https://hop{i}.example.com/") for i in range(10) if i % 2 == 0]),
])

# Chrome Cookies
build("chrome_cookies.sqlite", [
    ("CREATE TABLE cookies (creation_utc INTEGER, host_key TEXT, name TEXT, value TEXT, path TEXT, expires_utc INTEGER, is_secure INTEGER, is_httponly INTEGER, last_access_utc INTEGER)",
     [(WEBKIT_BASE + i * 1000000, f".site{i}.example.com", f"cookie{i}", f"value{i}", "/",
       WEBKIT_BASE + (i + 100) * 1000000, i % 2, (i + 1) % 2, WEBKIT_BASE + i * 1500000)
      for i in range(N)]),
])

# Firefox places.sqlite
build("firefox_places.sqlite", [
    ("CREATE TABLE moz_places (id INTEGER PRIMARY KEY, url TEXT, title TEXT, last_visit_date INTEGER)",
     [(i + 1, f"https://ff{i}.example.org/", f"FF Title {i}", UNIX_BASE_US + i * 1000000)
      for i in range(N)]),
    ("CREATE TABLE moz_historyvisits (id INTEGER PRIMARY KEY, place_id INTEGER, visit_date INTEGER, visit_type INTEGER)",
     [(i + 1, (i % N) + 1, UNIX_BASE_US + i * 2000000, (i % 9) + 1) for i in range(N)]),
])

# Firefox cookies.sqlite (expiry in SECONDS)
build("firefox_cookies.sqlite", [
    ("CREATE TABLE moz_cookies (id INTEGER PRIMARY KEY, host TEXT, name TEXT, value TEXT, path TEXT, expiry INTEGER, lastAccessed INTEGER, creationTime INTEGER, isSecure INTEGER, isHttpOnly INTEGER)",
     [(i + 1, f".ff{i}.example.org", f"ffcookie{i}", f"ffvalue{i}", "/",
       1700000000 + i * 3600, UNIX_BASE_US + i * 1000000, UNIX_BASE_US + i * 500000,
       i % 2, (i + 1) % 2) for i in range(N)]),
])

# Firefox downloads.sqlite (legacy schema)
build("firefox_downloads.sqlite", [
    ("CREATE TABLE moz_downloads (id INTEGER PRIMARY KEY, source TEXT, target TEXT, startTime INTEGER, endTime INTEGER, totalBytes INTEGER, state INTEGER)",
     [(i + 1, f"https://dl{i}.example.org/f.zip", f"/tmp/f{i}.zip",
       UNIX_BASE_US + i * 1000000, UNIX_BASE_US + i * 1000000 + 800000, 2000 + i, i % 3)
      for i in range(10)]),
])

# Overflow-page DB: one row with a TEXT value far larger than a page
build("overflow.sqlite", [
    ("CREATE TABLE blobs (id INTEGER PRIMARY KEY, body TEXT)",
     [(1, "ABCDEFGHIJ" * 400)]),  # 4000 chars >> 512-byte pages
])
