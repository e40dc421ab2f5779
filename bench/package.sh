#!/bin/sh
# Build dist/extraction.zip for spark-submit --py-files (north_rule ship shape).
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/extraction.zip
(cd src && zip -qr ../dist/extraction.zip extraction -x '*__pycache__*')
echo "built dist/extraction.zip:"
unzip -l dist/extraction.zip | tail -3
