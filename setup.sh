#!/usr/bin/env bash
# source setup.sh — put the repo on PYTHONPATH (reference setup.sh parity)
export DIR_PWD="$( cd "$( dirname "${BASH_SOURCE[0]}" )" && pwd )"
export PYTHONPATH="$PYTHONPATH:$DIR_PWD"
echo "$PYTHONPATH"
