#!/usr/bin/env python
"""Generate + freeze the offline evaluation datasets under data/.

Deterministic: re-running reproduces the committed JSONs byte-for-byte.
Self-validating: every math answer is re-derived independently and every
code task's canonical solution must pass its own tests before writing.

Role parity: reference ``experiments/final/setup_datasets.py`` (downloads
MMLU/HumanEval + synthesizes MT-bench/SimpleQA sets); here everything is
generated/authored locally (no network) with objective answers.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = pathlib.Path(__file__).resolve().parents[1] / "data"


# ---------------------------------------------------------------------------
# factual multiple choice (hand-authored objective facts, MMLU-style breadth)

FACTUAL = [
    # (question, [A, B, C, D], correct letter)
    ("What is the capital of Australia?",
     ["Sydney", "Canberra", "Melbourne", "Perth"], "B"),
    ("Which planet has the most moons discovered as of the 2020s?",
     ["Jupiter", "Mars", "Saturn", "Neptune"], "C"),
    ("What is the chemical symbol for potassium?",
     ["P", "Po", "K", "Kp"], "C"),
    ("Which data structure gives O(1) average-case lookup by key?",
     ["Linked list", "Hash table", "Binary search tree", "Heap"], "B"),
    ("What is the time complexity of binary search on a sorted array of n items?",
     ["O(n)", "O(log n)", "O(n log n)", "O(1)"], "B"),
    ("Which gas makes up most of Earth's atmosphere?",
     ["Oxygen", "Carbon dioxide", "Nitrogen", "Argon"], "C"),
    ("Who formulated the laws of motion published in the Principia (1687)?",
     ["Galileo Galilei", "Isaac Newton", "Johannes Kepler", "Rene Descartes"], "B"),
    ("What is 2 to the power of 10?",
     ["512", "1024", "2048", "4096"], "B"),
    ("Which river is the longest in Africa?",
     ["Congo", "Niger", "Zambezi", "Nile"], "D"),
    ("In which year did the Berlin Wall fall?",
     ["1987", "1989", "1991", "1993"], "B"),
    ("What does the CAP theorem's 'P' stand for?",
     ["Performance", "Persistence", "Partition tolerance", "Parallelism"], "C"),
    ("Which element has atomic number 1?",
     ["Helium", "Hydrogen", "Lithium", "Oxygen"], "B"),
    ("What is the derivative of sin(x) with respect to x?",
     ["cos(x)", "-cos(x)", "sin(x)", "-sin(x)"], "A"),
    ("Which ocean is the deepest on average?",
     ["Atlantic", "Indian", "Pacific", "Arctic"], "C"),
    ("Who wrote 'One Hundred Years of Solitude'?",
     ["Jorge Luis Borges", "Gabriel Garcia Marquez", "Pablo Neruda",
      "Mario Vargas Llosa"], "B"),
    ("What is the SI unit of electric current?",
     ["Volt", "Ohm", "Ampere", "Watt"], "C"),
    ("Which sorting algorithm is NOT comparison-based?",
     ["Merge sort", "Quick sort", "Radix sort", "Heap sort"], "C"),
    ("What is the capital of Canada?",
     ["Toronto", "Vancouver", "Montreal", "Ottawa"], "D"),
    ("How many bits are in an IPv4 address?",
     ["16", "32", "64", "128"], "B"),
    ("Which blood type is the universal donor for red blood cells?",
     ["AB+", "O-", "A+", "B-"], "B"),
    ("What is the integral of 1/x dx for x > 0?",
     ["x^-2 + C", "ln(x) + C", "e^x + C", "1/(2x^2) + C"], "B"),
    ("Which country has the largest population as of the mid-2020s?",
     ["China", "United States", "India", "Indonesia"], "C"),
    ("In TCP, what does the three-way handshake establish?",
     ["Encryption keys", "A connection", "DNS records", "Routing tables"], "B"),
    ("What is the speed of light in vacuum, approximately?",
     ["3 x 10^6 m/s", "3 x 10^8 m/s", "3 x 10^10 m/s", "3 x 10^5 m/s"], "B"),
    ("Which organ produces insulin?",
     ["Liver", "Kidney", "Pancreas", "Spleen"], "C"),
    ("What is the smallest prime number?",
     ["0", "1", "2", "3"], "C"),
    ("Which mountain is the tallest above sea level?",
     ["K2", "Kangchenjunga", "Mount Everest", "Lhotse"], "C"),
    ("Who painted the ceiling of the Sistine Chapel?",
     ["Leonardo da Vinci", "Raphael", "Michelangelo", "Donatello"], "C"),
    ("What does GPU memory bandwidth primarily limit during LLM decoding?",
     ["Weight streaming rate", "Instruction decode", "Branch prediction",
      "Disk I/O"], "A"),
    ("Which language family does Hungarian belong to?",
     ["Indo-European", "Uralic", "Turkic", "Semitic"], "B"),
    ("What is the pH of pure water at 25 degrees Celsius?",
     ["5", "6", "7", "8"], "C"),
    ("Which treaty ended World War I with Germany?",
     ["Treaty of Vienna", "Treaty of Versailles", "Treaty of Paris",
      "Treaty of Tordesillas"], "B"),
    ("In Big-O terms, what is the cost of inserting at the head of a singly linked list?",
     ["O(1)", "O(log n)", "O(n)", "O(n^2)"], "A"),
    ("Which particle carries the electromagnetic force?",
     ["Gluon", "Photon", "W boson", "Graviton"], "B"),
    ("What is the currency of Japan?",
     ["Won", "Yuan", "Yen", "Ringgit"], "C"),
    ("Which amendment to the US Constitution abolished slavery?",
     ["10th", "13th", "15th", "19th"], "B"),
    ("What is the longest bone in the human body?",
     ["Tibia", "Humerus", "Femur", "Fibula"], "C"),
    ("Which of these is a stable sorting algorithm (standard form)?",
     ["Quick sort", "Heap sort", "Selection sort", "Merge sort"], "D"),
    ("What is the freezing point of water in Fahrenheit?",
     ["0", "32", "100", "212"], "B"),
    ("Which country hosted the first modern Olympic Games (1896)?",
     ["France", "Greece", "England", "Italy"], "B"),
]


def build_factual() -> list[dict]:
    items = []
    for i, (q, opts, ans) in enumerate(FACTUAL):
        lines = [f"{chr(ord('A') + j)}) {o}" for j, o in enumerate(opts)]
        prompt = (
            f"Question: {q}\n" + "\n".join(lines) +
            "\nAnswer with the letter of the correct option."
        )
        items.append({
            "id": f"factual-{i:03d}", "task": "factual", "prompt": prompt,
            "question": q, "options": opts, "answer": ans,
        })
    return items


# ---------------------------------------------------------------------------
# GSM-style multi-step arithmetic word problems (generated, exact answers)

NAMES = ["Ava", "Ben", "Chloe", "Dan", "Elif", "Farid", "Grace", "Hiro",
         "Ines", "Jonas", "Kira", "Liam"]
ITEMS = ["apples", "notebooks", "marbles", "stickers", "bottles", "coins",
         "pencils", "tickets", "cookies", "books"]


def build_gsm(n: int = 100, seed: int = 7) -> list[dict]:
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        kind = i % 4
        name = NAMES[int(rng.integers(len(NAMES)))]
        other = NAMES[int(rng.integers(len(NAMES)))]
        thing = ITEMS[int(rng.integers(len(ITEMS)))]
        if kind == 0:  # buy in packs, give away, count remainder
            packs = int(rng.integers(3, 12))
            per = int(rng.integers(4, 15))
            given = int(rng.integers(2, packs * per // 2))
            ans = packs * per - given
            q = (f"{name} buys {packs} packs of {thing} with {per} in each "
                 f"pack, then gives {given} to {other}. How many {thing} "
                 f"does {name} have left?")
        elif kind == 1:  # earn per day, spend fraction
            days = int(rng.integers(5, 21))
            per_day = int(rng.integers(8, 40))
            spend = int(rng.integers(2, 5))
            total = days * per_day
            ans = total - total // spend
            q = (f"{name} earns {per_day} dollars per day for {days} days "
                 f"and spends one {['half','third','quarter'][spend-2]} of "
                 f"the total. How many dollars remain?")
        elif kind == 2:  # two-rate comparison
            r1 = int(rng.integers(3, 12))
            r2 = int(rng.integers(3, 12))
            h1 = int(rng.integers(2, 9))
            h2 = int(rng.integers(2, 9))
            ans = r1 * h1 + r2 * h2
            q = (f"{name} packs {r1} boxes per hour for {h1} hours in the "
                 f"morning and {r2} boxes per hour for {h2} hours in the "
                 f"afternoon. How many boxes in total?")
        else:  # split evenly with remainder
            total = int(rng.integers(40, 200))
            people = int(rng.integers(3, 9))
            ans = total % people
            q = (f"A jar holds {total} {thing}. {name} shares them equally "
                 f"among {people} friends, keeping the remainder. How many "
                 f"{thing} does {name} keep?")
        out.append({
            "id": f"gsm-{i:03d}", "task": "math",
            "prompt": q + " Give the final number.",
            "answer": str(ans),
        })
    return out


# ---------------------------------------------------------------------------
# HumanEval-style programming tasks (spec + hidden tests + canonical solution)

CODE_TASKS = [
    {
        "entry": "running_max",
        "prompt": "def running_max(xs):\n    \"\"\"Return a list where element i is the maximum of xs[:i+1]. Empty input -> empty list.\"\"\"",
        "solution": "def running_max(xs):\n    out = []\n    cur = None\n    for x in xs:\n        cur = x if cur is None or x > cur else cur\n        out.append(cur)\n    return out",
        "tests": [
            "assert running_max([]) == []",
            "assert running_max([3, 1, 4, 1, 5]) == [3, 3, 4, 4, 5]",
            "assert running_max([-2, -5, -1]) == [-2, -2, -1]",
        ],
    },
    {
        "entry": "is_balanced",
        "prompt": "def is_balanced(s):\n    \"\"\"Return True iff the parentheses '(' and ')' in s are balanced.\"\"\"",
        "solution": "def is_balanced(s):\n    depth = 0\n    for c in s:\n        if c == '(':\n            depth += 1\n        elif c == ')':\n            depth -= 1\n            if depth < 0:\n                return False\n    return depth == 0",
        "tests": [
            "assert is_balanced('(a(b)c)') is True",
            "assert is_balanced(')(') is False",
            "assert is_balanced('(((') is False",
            "assert is_balanced('') is True",
        ],
    },
    {
        "entry": "second_largest",
        "prompt": "def second_largest(xs):\n    \"\"\"Return the second-largest DISTINCT value in xs; None if absent.\"\"\"",
        "solution": "def second_largest(xs):\n    uniq = sorted(set(xs))\n    return uniq[-2] if len(uniq) >= 2 else None",
        "tests": [
            "assert second_largest([5, 1, 5, 3]) == 3",
            "assert second_largest([2, 2, 2]) is None",
            "assert second_largest([1, 2]) == 1",
        ],
    },
    {
        "entry": "rle_encode",
        "prompt": "def rle_encode(s):\n    \"\"\"Run-length encode: 'aaabb' -> [('a', 3), ('b', 2)].\"\"\"",
        "solution": "def rle_encode(s):\n    out = []\n    for c in s:\n        if out and out[-1][0] == c:\n            out[-1] = (c, out[-1][1] + 1)\n        else:\n            out.append((c, 1))\n    return out",
        "tests": [
            "assert rle_encode('aaabb') == [('a', 3), ('b', 2)]",
            "assert rle_encode('') == []",
            "assert rle_encode('abc') == [('a', 1), ('b', 1), ('c', 1)]",
        ],
    },
    {
        "entry": "digits_sum_until_single",
        "prompt": "def digits_sum_until_single(n):\n    \"\"\"Repeatedly sum the decimal digits of non-negative n until one digit remains; return it.\"\"\"",
        "solution": "def digits_sum_until_single(n):\n    while n >= 10:\n        n = sum(int(d) for d in str(n))\n    return n",
        "tests": [
            "assert digits_sum_until_single(0) == 0",
            "assert digits_sum_until_single(99) == 9",
            "assert digits_sum_until_single(12345) == 6",
        ],
    },
    {
        "entry": "merge_sorted",
        "prompt": "def merge_sorted(a, b):\n    \"\"\"Merge two sorted lists into one sorted list (stable).\"\"\"",
        "solution": "def merge_sorted(a, b):\n    i = j = 0\n    out = []\n    while i < len(a) and j < len(b):\n        if a[i] <= b[j]:\n            out.append(a[i]); i += 1\n        else:\n            out.append(b[j]); j += 1\n    out.extend(a[i:]); out.extend(b[j:])\n    return out",
        "tests": [
            "assert merge_sorted([1, 3], [2, 4]) == [1, 2, 3, 4]",
            "assert merge_sorted([], [1]) == [1]",
            "assert merge_sorted([5, 6], []) == [5, 6]",
        ],
    },
    {
        "entry": "count_vowel_words",
        "prompt": "def count_vowel_words(text):\n    \"\"\"Count whitespace-separated words that START with a vowel (case-insensitive).\"\"\"",
        "solution": "def count_vowel_words(text):\n    return sum(1 for w in text.split() if w[:1].lower() in 'aeiou')",
        "tests": [
            "assert count_vowel_words('An apple a day') == 3",
            "assert count_vowel_words('') == 0",
            "assert count_vowel_words('Under the Oak') == 2",
        ],
    },
    {
        "entry": "matrix_diag_sum",
        "prompt": "def matrix_diag_sum(m):\n    \"\"\"Sum of the main diagonal of a square matrix given as list of rows.\"\"\"",
        "solution": "def matrix_diag_sum(m):\n    return sum(m[i][i] for i in range(len(m)))",
        "tests": [
            "assert matrix_diag_sum([[1, 2], [3, 4]]) == 5",
            "assert matrix_diag_sum([[7]]) == 7",
            "assert matrix_diag_sum([]) == 0",
        ],
    },
    {
        "entry": "chunk",
        "prompt": "def chunk(xs, k):\n    \"\"\"Split xs into consecutive chunks of size k (last may be shorter). k >= 1.\"\"\"",
        "solution": "def chunk(xs, k):\n    return [xs[i:i + k] for i in range(0, len(xs), k)]",
        "tests": [
            "assert chunk([1, 2, 3, 4, 5], 2) == [[1, 2], [3, 4], [5]]",
            "assert chunk([], 3) == []",
            "assert chunk([1, 2], 5) == [[1, 2]]",
        ],
    },
    {
        "entry": "dedupe_keep_order",
        "prompt": "def dedupe_keep_order(xs):\n    \"\"\"Remove duplicates from xs keeping first occurrences, preserving order.\"\"\"",
        "solution": "def dedupe_keep_order(xs):\n    seen = set()\n    out = []\n    for x in xs:\n        if x not in seen:\n            seen.add(x)\n            out.append(x)\n    return out",
        "tests": [
            "assert dedupe_keep_order([1, 2, 1, 3, 2]) == [1, 2, 3]",
            "assert dedupe_keep_order([]) == []",
            "assert dedupe_keep_order(['b', 'a', 'b']) == ['b', 'a']",
        ],
    },
]


def build_code() -> list[dict]:
    items = []
    for i, t in enumerate(CODE_TASKS):
        items.append({
            "id": f"code-{i:03d}", "task": "code",
            "prompt": (
                "Complete the following Python function.\n\n" + t["prompt"] +
                "\n\nReturn only the full function definition."
            ),
            "entry": t["entry"],
            "tests": t["tests"],
            "answer": t["solution"],   # canonical solution (reference text)
        })
    return items


def main() -> None:
    from adaptive_sd_tpu.evalx.datasets import _run_code_tests, score_math

    DATA.mkdir(exist_ok=True)
    factual = build_factual()
    gsm = build_gsm()
    code = build_code()

    # self-validation: canonical solutions must pass their own tests; math
    # answers must round-trip through the scorer
    for it in code:
        rate = _run_code_tests(it["answer"], it["tests"], it["entry"])
        assert rate == 1.0, f"canonical solution fails tests: {it['id']}"
    for it in gsm:
        assert score_math(f"The answer is {it['answer']}.", it["answer"]) == 1.0

    for name, items in [("factual_qa.json", factual),
                        ("gsm_style.json", gsm),
                        ("humaneval_style.json", code)]:
        with open(DATA / name, "w") as f:
            json.dump(items, f, indent=1)
        print(f"wrote data/{name}: {len(items)} items")


if __name__ == "__main__":
    main()
