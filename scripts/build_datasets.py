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
    ("What is the capital of Brazil?",
     ["Rio de Janeiro", "Sao Paulo", "Brasilia", "Salvador"], "C"),
    ("Which metal is liquid at room temperature?",
     ["Lead", "Mercury", "Gallium only above 35C", "Sodium"], "B"),
    ("How many chromosomes does a typical human somatic cell have?",
     ["23", "42", "46", "48"], "C"),
    ("Which protocol resolves domain names to IP addresses?",
     ["DHCP", "DNS", "ARP", "SMTP"], "B"),
    ("What is the largest internal organ of the human body?",
     ["Brain", "Liver", "Heart", "Lungs"], "B"),
    ("Which planet is known as the Red Planet?",
     ["Venus", "Jupiter", "Mars", "Mercury"], "C"),
    ("What is the square root of 144?",
     ["10", "11", "12", "14"], "C"),
    ("Which sea separates Europe from Africa?",
     ["Black Sea", "Mediterranean Sea", "Caspian Sea", "Red Sea"], "B"),
    ("Who developed the theory of general relativity?",
     ["Niels Bohr", "Max Planck", "Albert Einstein", "Werner Heisenberg"], "C"),
    ("What is the chemical formula of table salt?",
     ["KCl", "NaCl", "CaCl2", "NaOH"], "B"),
    ("Which continent has the most countries?",
     ["Asia", "Europe", "Africa", "South America"], "C"),
    ("In what year did World War II end?",
     ["1943", "1944", "1945", "1946"], "C"),
    ("Which keyword defines an anonymous function in Python?",
     ["def", "lambda", "func", "let"], "B"),
    ("What does RAM stand for?",
     ["Rapid Access Module", "Random Access Memory", "Read And Modify",
      "Runtime Allocated Memory"], "B"),
    ("Which is the smallest country by area?",
     ["Monaco", "Malta", "Vatican City", "San Marino"], "C"),
    ("What is the boiling point of water at sea level in Celsius?",
     ["90", "95", "100", "110"], "C"),
    ("Which artist painted 'Starry Night'?",
     ["Claude Monet", "Vincent van Gogh", "Paul Cezanne", "Edgar Degas"], "B"),
    ("How many sides does a hexagon have?",
     ["5", "6", "7", "8"], "B"),
    ("Which instrument measures atmospheric pressure?",
     ["Hygrometer", "Barometer", "Anemometer", "Thermometer"], "B"),
    ("What is the largest mammal?",
     ["African elephant", "Blue whale", "Sperm whale", "Giraffe"], "B"),
    ("Which language has the most native speakers worldwide?",
     ["English", "Hindi", "Mandarin Chinese", "Spanish"], "C"),
    ("What is the primary gas in the Sun?",
     ["Oxygen", "Helium", "Hydrogen", "Carbon"], "C"),
    ("Which number system uses base 16?",
     ["Binary", "Octal", "Decimal", "Hexadecimal"], "D"),
    ("Who wrote 'Pride and Prejudice'?",
     ["Charlotte Bronte", "Jane Austen", "Mary Shelley", "George Eliot"], "B"),
    ("What is the hardest natural material?",
     ["Quartz", "Topaz", "Diamond", "Corundum"], "C"),
    ("Which river flows through Paris?",
     ["Loire", "Rhone", "Seine", "Garonne"], "C"),
    ("How many players are on a soccer team on the field per side?",
     ["9", "10", "11", "12"], "C"),
    ("Which vitamin is produced in human skin under sunlight?",
     ["Vitamin A", "Vitamin B12", "Vitamin C", "Vitamin D"], "D"),
    ("What is the capital of South Korea?",
     ["Busan", "Seoul", "Incheon", "Daegu"], "B"),
    ("Which logic gate outputs 1 only when both inputs are 1?",
     ["OR", "XOR", "AND", "NAND"], "C"),
    ("What is the freezing point of water in Kelvin, approximately?",
     ["0", "100", "273", "373"], "C"),
    ("Which ancient wonder stood in Alexandria?",
     ["Hanging Gardens", "The Lighthouse (Pharos)", "Colossus",
      "Temple of Artemis"], "B"),
    ("What does HTTP status code 404 mean?",
     ["Server error", "Unauthorized", "Not found", "Forbidden"], "C"),
    ("Which organelle is the site of cellular respiration?",
     ["Nucleus", "Ribosome", "Mitochondrion", "Golgi apparatus"], "C"),
    ("Who composed the Ninth Symphony with the 'Ode to Joy'?",
     ["Mozart", "Beethoven", "Bach", "Brahms"], "B"),
    ("What is the currency of the United Kingdom?",
     ["Euro", "Pound sterling", "Franc", "Krona"], "B"),
    ("Which desert is the largest hot desert?",
     ["Gobi", "Kalahari", "Sahara", "Atacama"], "C"),
    ("How many bytes are in a kibibyte?",
     ["1000", "1024", "2048", "512"], "B"),
    ("Which law states that current equals voltage divided by resistance?",
     ["Faraday's law", "Ohm's law", "Ampere's law", "Kirchhoff's law"], "B"),
    ("What is the tallest animal?",
     ["Elephant", "Giraffe", "Ostrich", "Moose"], "B"),
    ("Which country invented paper?",
     ["Egypt", "Greece", "China", "India"], "C"),
    ("What is the main component of natural gas?",
     ["Propane", "Butane", "Methane", "Ethanol"], "C"),
    ("Which data format uses tags like <html> and </html>?",
     ["JSON", "YAML", "Markup (HTML/XML)", "CSV"], "C"),
    ("How many degrees are in the interior angles of a triangle?",
     ["90", "180", "270", "360"], "B"),
    ("Which explorer led the first expedition to circumnavigate the globe?",
     ["Columbus", "Magellan", "Vasco da Gama", "Cook"], "B"),
    ("What is the most abundant element in the universe?",
     ["Helium", "Oxygen", "Hydrogen", "Carbon"], "C"),
    ("Which city hosted the 2012 Summer Olympics?",
     ["Beijing", "London", "Rio de Janeiro", "Athens"], "B"),
    ("What does CPU cache primarily reduce?",
     ["Disk usage", "Memory access latency", "Network latency",
      "Power draw"], "B"),
    ("Which scientist proposed natural selection alongside Darwin?",
     ["Gregor Mendel", "Alfred Russel Wallace", "Thomas Huxley",
      "Charles Lyell"], "B"),
    ("What is the capital of Egypt?",
     ["Alexandria", "Giza", "Cairo", "Luxor"], "C"),
    ("Which unit measures frequency?",
     ["Pascal", "Hertz", "Joule", "Newton"], "B"),
    ("How many continents are there?",
     ["5", "6", "7", "8"], "C"),
    ("Which programming paradigm does Haskell primarily follow?",
     ["Object-oriented", "Functional", "Procedural", "Logic"], "B"),
    ("What is the longest river in South America?",
     ["Parana", "Orinoco", "Amazon", "Magdalena"], "C"),
    ("Which gas do plants absorb for photosynthesis?",
     ["Oxygen", "Nitrogen", "Carbon dioxide", "Hydrogen"], "C"),
    ("Who was the first woman to win a Nobel Prize?",
     ["Rosalind Franklin", "Marie Curie", "Lise Meitner",
      "Dorothy Hodgkin"], "B"),
    ("What is 15% of 200?",
     ["25", "30", "35", "40"], "B"),
    ("Which scheduling property does a FIFO queue guarantee?",
     ["Priority order", "Arrival order", "Shortest job first",
      "Round robin"], "B"),
    ("Which strait separates Asia from North America?",
     ["Strait of Gibraltar", "Bering Strait", "Strait of Malacca",
      "Bosporus"], "B"),
    ("What is the atomic symbol for gold?",
     ["Go", "Gd", "Au", "Ag"], "C"),
]


def _generated_factual(n: int = 24, seed: int = 13) -> list[tuple]:
    """Programmatic objective items (conversions/orderings with exact
    answers) — deterministic, self-verifying breadth filler."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        kind = i % 4
        if kind == 0:   # decimal -> binary
            v = int(rng.integers(5, 64))
            correct = bin(v)[2:]
            opts = {correct}
            while len(opts) < 4:
                opts.add(bin(int(rng.integers(5, 64)))[2:])
            opts = sorted(opts)
            q = f"What is {v} in binary?"
        elif kind == 1:  # hex -> decimal
            v = int(rng.integers(16, 255))
            correct = str(v)
            opts = {correct}
            while len(opts) < 4:
                opts.add(str(int(rng.integers(16, 255))))
            opts = sorted(opts, key=int)
            q = f"What is hexadecimal 0x{v:X} in decimal?"
        elif kind == 2:  # gcd
            a, b = int(rng.integers(12, 96)), int(rng.integers(12, 96))
            correct = str(int(np.gcd(a, b)))
            opts = {correct}
            while len(opts) < 4:
                opts.add(str(int(rng.integers(1, 24))))
            opts = sorted(opts, key=int)
            q = f"What is the greatest common divisor of {a} and {b}?"
        else:           # exact product
            a, b = int(rng.integers(11, 29)), int(rng.integers(11, 29))
            correct = str(a * b)
            opts = {correct}
            while len(opts) < 4:
                opts.add(str(a * b + int(rng.integers(-15, 16)) or a * b + 1))
            opts = sorted(opts, key=int)
            q = f"What is {a} times {b}?"
        letter = chr(ord("A") + opts.index(correct))
        out.append((q, list(opts), letter))
    return out


def build_factual() -> list[dict]:
    items = []
    for i, (q, opts, ans) in enumerate(FACTUAL + _generated_factual()):
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


def build_gsm(n: int = 200, seed: int = 7) -> list[dict]:
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        kind = i % 6
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
        elif kind == 3:  # split evenly with remainder
            total = int(rng.integers(40, 200))
            people = int(rng.integers(3, 9))
            ans = total % people
            q = (f"A jar holds {total} {thing}. {name} shares them equally "
                 f"among {people} friends, keeping the remainder. How many "
                 f"{thing} does {name} keep?")
        elif kind == 4:  # purchase + change
            count = int(rng.integers(3, 9))
            price = int(rng.integers(2, 12))
            paid = ((count * price) // 10 + 1 + int(rng.integers(1, 4))) * 10
            ans = paid - count * price
            q = (f"{name} buys {count} {thing} at {price} dollars each and "
                 f"pays with {paid} dollars. How much change does {name} "
                 f"get back?")
        else:  # consume at a rate, count what is left after partial use
            total = int(rng.integers(6, 15)) * 12
            per_day = int(rng.integers(2, 7))
            days = int(rng.integers(3, min(10, total // per_day)))
            ans = total - per_day * days
            q = (f"A box contains {total} {thing}. {name} uses {per_day} "
                 f"per day for {days} days. How many {thing} are left?")
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


def _mk(entry, doc, solution, tests):
    """Compact task constructor: prompt = signature line + docstring."""
    sig = solution.split("\n", 1)[0]
    return {
        "entry": entry,
        "prompt": f'{sig}\n    """{doc}"""',
        "solution": solution,
        "tests": tests,
    }


CODE_TASKS += [
    _mk("fizzbuzz_list", "Return ['Fizz'/'Buzz'/'FizzBuzz'/str(i)] for i in 1..n.",
        "def fizzbuzz_list(n):\n    out = []\n    for i in range(1, n + 1):\n        s = ('Fizz' if i % 3 == 0 else '') + ('Buzz' if i % 5 == 0 else '')\n        out.append(s or str(i))\n    return out",
        ["assert fizzbuzz_list(5) == ['1', '2', 'Fizz', '4', 'Buzz']",
         "assert fizzbuzz_list(15)[-1] == 'FizzBuzz'",
         "assert fizzbuzz_list(0) == []"]),
    _mk("reverse_words", "Reverse word order, collapsing extra whitespace.",
        "def reverse_words(s):\n    return ' '.join(reversed(s.split()))",
        ["assert reverse_words('the quick  brown') == 'brown quick the'",
         "assert reverse_words('') == ''",
         "assert reverse_words('one') == 'one'"]),
    _mk("is_palindrome", "True iff alphanumeric chars read the same backwards (case-insensitive).",
        "def is_palindrome(s):\n    t = [c.lower() for c in s if c.isalnum()]\n    return t == t[::-1]",
        ["assert is_palindrome('A man, a plan, a canal: Panama') is True",
         "assert is_palindrome('abc') is False",
         "assert is_palindrome('') is True"]),
    _mk("two_sum", "Return indices (i, j), i<j, with xs[i]+xs[j]==target; None if absent.",
        "def two_sum(xs, target):\n    seen = {}\n    for j, x in enumerate(xs):\n        if target - x in seen:\n            return (seen[target - x], j)\n        if x not in seen:\n            seen[x] = j\n    return None",
        ["assert two_sum([2, 7, 11, 15], 9) == (0, 1)",
         "assert two_sum([3, 3], 6) == (0, 1)",
         "assert two_sum([1, 2], 7) is None"]),
    _mk("flatten_once", "Flatten one level of nesting: [[1,2],[3]] -> [1,2,3].",
        "def flatten_once(xss):\n    return [x for xs in xss for x in xs]",
        ["assert flatten_once([[1, 2], [3]]) == [1, 2, 3]",
         "assert flatten_once([]) == []",
         "assert flatten_once([[], [1]]) == [1]"]),
    _mk("count_occurrences", "Dict mapping each element of xs to its count.",
        "def count_occurrences(xs):\n    out = {}\n    for x in xs:\n        out[x] = out.get(x, 0) + 1\n    return out",
        ["assert count_occurrences(['a', 'b', 'a']) == {'a': 2, 'b': 1}",
         "assert count_occurrences([]) == {}",
         "assert count_occurrences([1, 1, 1]) == {1: 3}"]),
    _mk("binary_search", "Index of target in sorted xs, else -1.",
        "def binary_search(xs, target):\n    lo, hi = 0, len(xs) - 1\n    while lo <= hi:\n        mid = (lo + hi) // 2\n        if xs[mid] == target:\n            return mid\n        if xs[mid] < target:\n            lo = mid + 1\n        else:\n            hi = mid - 1\n    return -1",
        ["assert binary_search([1, 3, 5, 7], 5) == 2",
         "assert binary_search([1, 3, 5, 7], 4) == -1",
         "assert binary_search([], 1) == -1"]),
    _mk("fib", "n-th Fibonacci number with fib(0)=0, fib(1)=1 (iterative).",
        "def fib(n):\n    a, b = 0, 1\n    for _ in range(n):\n        a, b = b, a + b\n    return a",
        ["assert fib(0) == 0", "assert fib(10) == 55", "assert fib(1) == 1"]),
    _mk("caesar", "Shift letters by k (wrapping), preserve case and non-letters.",
        "def caesar(s, k):\n    out = []\n    for c in s:\n        if c.isalpha():\n            base = 65 if c.isupper() else 97\n            out.append(chr((ord(c) - base + k) % 26 + base))\n        else:\n            out.append(c)\n    return ''.join(out)",
        ["assert caesar('abz', 1) == 'bca'",
         "assert caesar('Hello, World!', 0) == 'Hello, World!'",
         "assert caesar('Z', 2) == 'B'"]),
    _mk("transpose", "Transpose a rectangular matrix (list of rows).",
        "def transpose(m):\n    return [list(col) for col in zip(*m)]",
        ["assert transpose([[1, 2], [3, 4]]) == [[1, 3], [2, 4]]",
         "assert transpose([[1, 2, 3]]) == [[1], [2], [3]]",
         "assert transpose([]) == []"]),
    _mk("intersect_sorted", "Intersection of two sorted lists (with duplicates, two-pointer).",
        "def intersect_sorted(a, b):\n    i = j = 0\n    out = []\n    while i < len(a) and j < len(b):\n        if a[i] == b[j]:\n            out.append(a[i]); i += 1; j += 1\n        elif a[i] < b[j]:\n            i += 1\n        else:\n            j += 1\n    return out",
        ["assert intersect_sorted([1, 2, 2, 3], [2, 2, 4]) == [2, 2]",
         "assert intersect_sorted([], [1]) == []",
         "assert intersect_sorted([1, 5], [5]) == [5]"]),
    _mk("roman_to_int", "Convert a Roman numeral (I,V,X,L,C,D,M) to an integer.",
        "def roman_to_int(s):\n    vals = {'I': 1, 'V': 5, 'X': 10, 'L': 50, 'C': 100, 'D': 500, 'M': 1000}\n    total = 0\n    for i, c in enumerate(s):\n        v = vals[c]\n        if i + 1 < len(s) and vals[s[i + 1]] > v:\n            total -= v\n        else:\n            total += v\n    return total",
        ["assert roman_to_int('XIV') == 14",
         "assert roman_to_int('MCMXCIV') == 1994",
         "assert roman_to_int('III') == 3"]),
    _mk("move_zeros", "Move all zeros to the end, keeping other elements' order.",
        "def move_zeros(xs):\n    nz = [x for x in xs if x != 0]\n    return nz + [0] * (len(xs) - len(nz))",
        ["assert move_zeros([0, 1, 0, 3]) == [1, 3, 0, 0]",
         "assert move_zeros([]) == []",
         "assert move_zeros([1, 2]) == [1, 2]"]),
    _mk("digits_of", "List of decimal digits of non-negative n, most significant first.",
        "def digits_of(n):\n    return [int(d) for d in str(n)]",
        ["assert digits_of(1203) == [1, 2, 0, 3]",
         "assert digits_of(0) == [0]",
         "assert digits_of(7) == [7]"]),
    _mk("clamp_all", "Clamp every value into [lo, hi].",
        "def clamp_all(xs, lo, hi):\n    return [min(max(x, lo), hi) for x in xs]",
        ["assert clamp_all([-1, 5, 99], 0, 10) == [0, 5, 10]",
         "assert clamp_all([], 0, 1) == []",
         "assert clamp_all([3], 3, 3) == [3]"]),
    _mk("first_unique_char", "Index of the first non-repeating character; -1 if none.",
        "def first_unique_char(s):\n    counts = {}\n    for c in s:\n        counts[c] = counts.get(c, 0) + 1\n    for i, c in enumerate(s):\n        if counts[c] == 1:\n            return i\n    return -1",
        ["assert first_unique_char('leetcode') == 0",
         "assert first_unique_char('aabb') == -1",
         "assert first_unique_char('') == -1"]),
    _mk("power_set_size", "Number of subsets of a set of n elements.",
        "def power_set_size(n):\n    return 2 ** n",
        ["assert power_set_size(0) == 1", "assert power_set_size(3) == 8",
         "assert power_set_size(10) == 1024"]),
    _mk("is_prime", "True iff n is a prime number.",
        "def is_prime(n):\n    if n < 2:\n        return False\n    i = 2\n    while i * i <= n:\n        if n % i == 0:\n            return False\n        i += 1\n    return True",
        ["assert is_prime(2) is True", "assert is_prime(1) is False",
         "assert is_prime(97) is True", "assert is_prime(91) is False"]),
    _mk("gcd", "Greatest common divisor of non-negative a and b (Euclid).",
        "def gcd(a, b):\n    while b:\n        a, b = b, a % b\n    return a",
        ["assert gcd(48, 36) == 12", "assert gcd(7, 0) == 7",
         "assert gcd(0, 0) == 0"]),
    _mk("title_case", "Capitalize the first letter of each word, lowercase the rest.",
        "def title_case(s):\n    return ' '.join(w[:1].upper() + w[1:].lower() for w in s.split())",
        ["assert title_case('hello WORLD') == 'Hello World'",
         "assert title_case('') == ''",
         "assert title_case('a') == 'A'"]),
    _mk("pairwise_sums", "List of sums of adjacent pairs: [1,2,3] -> [3,5].",
        "def pairwise_sums(xs):\n    return [xs[i] + xs[i + 1] for i in range(len(xs) - 1)]",
        ["assert pairwise_sums([1, 2, 3]) == [3, 5]",
         "assert pairwise_sums([5]) == []",
         "assert pairwise_sums([]) == []"]),
    _mk("longest_common_prefix", "Longest common prefix of a list of strings ('' if none).",
        "def longest_common_prefix(xs):\n    if not xs:\n        return ''\n    pre = xs[0]\n    for s in xs[1:]:\n        while not s.startswith(pre):\n            pre = pre[:-1]\n    return pre",
        ["assert longest_common_prefix(['flower', 'flow', 'flight']) == 'fl'",
         "assert longest_common_prefix(['dog', 'car']) == ''",
         "assert longest_common_prefix([]) == ''"]),
    _mk("rotate_list", "Rotate xs right by k positions (k may exceed len).",
        "def rotate_list(xs, k):\n    if not xs:\n        return []\n    k %= len(xs)\n    return xs[-k:] + xs[:-k] if k else list(xs)",
        ["assert rotate_list([1, 2, 3, 4], 1) == [4, 1, 2, 3]",
         "assert rotate_list([1, 2], 4) == [1, 2]",
         "assert rotate_list([], 3) == []"]),
    _mk("sum_of_squares", "Sum of squares of 1..n.",
        "def sum_of_squares(n):\n    return sum(i * i for i in range(1, n + 1))",
        ["assert sum_of_squares(3) == 14", "assert sum_of_squares(0) == 0",
         "assert sum_of_squares(10) == 385"]),
    _mk("anagrams", "True iff a and b are anagrams (case-insensitive, ignoring spaces).",
        "def anagrams(a, b):\n    norm = lambda s: sorted(s.replace(' ', '').lower())\n    return norm(a) == norm(b)",
        ["assert anagrams('Listen', 'Silent') is True",
         "assert anagrams('ab', 'abc') is False",
         "assert anagrams('', '') is True"]),
    _mk("max_subarray_sum", "Maximum sum of a contiguous non-empty subarray (Kadane).",
        "def max_subarray_sum(xs):\n    best = cur = xs[0]\n    for x in xs[1:]:\n        cur = max(x, cur + x)\n        best = max(best, cur)\n    return best",
        ["assert max_subarray_sum([-2, 1, -3, 4, -1, 2, 1, -5, 4]) == 6",
         "assert max_subarray_sum([-3, -1, -2]) == -1",
         "assert max_subarray_sum([5]) == 5"]),
    _mk("hamming", "Hamming distance between two equal-length strings.",
        "def hamming(a, b):\n    return sum(x != y for x, y in zip(a, b))",
        ["assert hamming('karolin', 'kathrin') == 3",
         "assert hamming('', '') == 0",
         "assert hamming('abc', 'abc') == 0"]),
    _mk("squares_dict", "Dict {i: i*i} for i in 1..n.",
        "def squares_dict(n):\n    return {i: i * i for i in range(1, n + 1)}",
        ["assert squares_dict(3) == {1: 1, 2: 4, 3: 9}",
         "assert squares_dict(0) == {}",
         "assert squares_dict(1) == {1: 1}"]),
    _mk("interleave", "Interleave two lists; append the tail of the longer.",
        "def interleave(a, b):\n    out = []\n    for x, y in zip(a, b):\n        out += [x, y]\n    longer = a if len(a) > len(b) else b\n    out += longer[min(len(a), len(b)):]\n    return out",
        ["assert interleave([1, 3], [2, 4]) == [1, 2, 3, 4]",
         "assert interleave([1], [2, 4, 6]) == [1, 2, 4, 6]",
         "assert interleave([], []) == []"]),
    _mk("strip_comments", "Remove '#' comments from each line of text, keeping line breaks.",
        "def strip_comments(text):\n    return '\\n'.join(line.split('#')[0].rstrip() for line in text.split('\\n'))",
        ["assert strip_comments('a = 1  # init\\nb = 2') == 'a = 1\\nb = 2'",
         "assert strip_comments('# only') == ''",
         "assert strip_comments('clean') == 'clean'"]),
    _mk("median", "Median of a non-empty list (average of middle two for even length).",
        "def median(xs):\n    s = sorted(xs)\n    n = len(s)\n    mid = n // 2\n    return s[mid] if n % 2 else (s[mid - 1] + s[mid]) / 2",
        ["assert median([3, 1, 2]) == 2",
         "assert median([4, 1, 3, 2]) == 2.5",
         "assert median([7]) == 7"]),
    _mk("count_islands_1d", "Number of maximal runs of 1s in a 0/1 list.",
        "def count_islands_1d(xs):\n    count = 0\n    prev = 0\n    for x in xs:\n        if x == 1 and prev == 0:\n            count += 1\n        prev = x\n    return count",
        ["assert count_islands_1d([1, 1, 0, 1]) == 2",
         "assert count_islands_1d([0, 0]) == 0",
         "assert count_islands_1d([]) == 0"]),
    _mk("expand_ranges", "Expand 'a-b' range strings: ['1-3','5'] -> [1,2,3,5].",
        "def expand_ranges(specs):\n    out = []\n    for spec in specs:\n        if '-' in spec:\n            a, b = spec.split('-')\n            out.extend(range(int(a), int(b) + 1))\n        else:\n            out.append(int(spec))\n    return out",
        ["assert expand_ranges(['1-3', '5']) == [1, 2, 3, 5]",
         "assert expand_ranges([]) == []",
         "assert expand_ranges(['7']) == [7]"]),
    _mk("vowel_count", "Count vowels (aeiou, case-insensitive) in s.",
        "def vowel_count(s):\n    return sum(1 for c in s.lower() if c in 'aeiou')",
        ["assert vowel_count('Hello') == 2", "assert vowel_count('xyz') == 0",
         "assert vowel_count('AEIOU') == 5"]),
    _mk("diff_lists", "Elements of a not in b, preserving a's order.",
        "def diff_lists(a, b):\n    bs = set(b)\n    return [x for x in a if x not in bs]",
        ["assert diff_lists([1, 2, 3], [2]) == [1, 3]",
         "assert diff_lists([], [1]) == []",
         "assert diff_lists([1, 1], []) == [1, 1]"]),
    _mk("cumulative_sum", "Running sums: [1,2,3] -> [1,3,6].",
        "def cumulative_sum(xs):\n    out = []\n    total = 0\n    for x in xs:\n        total += x\n        out.append(total)\n    return out",
        ["assert cumulative_sum([1, 2, 3]) == [1, 3, 6]",
         "assert cumulative_sum([]) == []",
         "assert cumulative_sum([-1, 1]) == [-1, 0]"]),
    _mk("parse_kv", "Parse 'k=v;k2=v2' into a dict (values as strings).",
        "def parse_kv(s):\n    out = {}\n    for part in s.split(';'):\n        if '=' in part:\n            k, v = part.split('=', 1)\n            out[k] = v\n    return out",
        ["assert parse_kv('a=1;b=two') == {'a': '1', 'b': 'two'}",
         "assert parse_kv('') == {}",
         "assert parse_kv('x=1=2') == {'x': '1=2'}"]),
    _mk("most_common", "The most frequent element (ties -> first to reach the max count).",
        "def most_common(xs):\n    counts = {}\n    best, best_n = None, 0\n    for x in xs:\n        counts[x] = counts.get(x, 0) + 1\n        if counts[x] > best_n:\n            best, best_n = x, counts[x]\n    return best",
        ["assert most_common([1, 2, 2, 3]) == 2",
         "assert most_common(['a']) == 'a'",
         "assert most_common([1, 2]) == 1"]),
    _mk("is_sorted_asc", "True iff xs is sorted in non-decreasing order.",
        "def is_sorted_asc(xs):\n    return all(xs[i] <= xs[i + 1] for i in range(len(xs) - 1))",
        ["assert is_sorted_asc([1, 2, 2, 3]) is True",
         "assert is_sorted_asc([3, 1]) is False",
         "assert is_sorted_asc([]) is True"]),
    _mk("snake_to_camel", "Convert snake_case to camelCase.",
        "def snake_to_camel(s):\n    parts = s.split('_')\n    return parts[0] + ''.join(p[:1].upper() + p[1:] for p in parts[1:])",
        ["assert snake_to_camel('hello_world_x') == 'helloWorldX'",
         "assert snake_to_camel('already') == 'already'",
         "assert snake_to_camel('') == ''"]),
    _mk("window_max", "Max of each length-k sliding window (k <= len(xs)).",
        "def window_max(xs, k):\n    return [max(xs[i:i + k]) for i in range(len(xs) - k + 1)]",
        ["assert window_max([1, 3, 2, 5], 2) == [3, 3, 5]",
         "assert window_max([4], 1) == [4]",
         "assert window_max([2, 1], 2) == [2]"]),
    _mk("collatz_steps", "Steps for n to reach 1 under the Collatz map.",
        "def collatz_steps(n):\n    steps = 0\n    while n != 1:\n        n = n // 2 if n % 2 == 0 else 3 * n + 1\n        steps += 1\n    return steps",
        ["assert collatz_steps(1) == 0", "assert collatz_steps(6) == 8",
         "assert collatz_steps(27) == 111"]),
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
