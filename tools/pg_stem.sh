#!/bin/bash
# Throwaway single-purpose postgres whose snowball dictionaries (verbatim
# builds of the snowballstem.org sources) serve as the stem-vector oracle
# for tools/gen_stem_vectors.py. Unix socket only, /tmp/pgstem:5499.
set -eu
BIN=/usr/lib/postgresql/15/bin
D=/tmp/pgstem_data
S=/tmp/pgstem
# postgres refuses to run as root; the sandbox shell is root, so hop to the
# packaged postgres user for the server processes only.
AS="setpriv --reuid postgres --regid postgres --clear-groups --"
$AS "$BIN/pg_ctl" -D "$D" stop -m immediate >/dev/null 2>&1 || true
rm -rf "$D" "$S"; mkdir -p "$D" "$S"
chown postgres:postgres "$D" "$S"
$AS "$BIN/initdb" -D "$D" -U pg -A trust >/dev/null
$AS "$BIN/pg_ctl" -D "$D" -o "-p 5499 -k $S -c listen_addresses=''" \
  -l /tmp/pgstem.log -w start >/dev/null
# raw_<lang>: snowball with NO stopword list so ts_lexize stems every word.
for L in arabic danish dutch english finnish french german greek hungarian \
         italian norwegian portuguese romanian russian spanish swedish \
         tamil turkish; do
  psql -h "$S" -p 5499 -U pg postgres -q -c \
    "CREATE TEXT SEARCH DICTIONARY raw_$L (TEMPLATE = snowball, Language = $L);"
done
echo "pgstem ready on $S:5499"
