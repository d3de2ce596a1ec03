"""Deterministic value pools for the synthetic Common-Crawl-style pages corpus.

Field repertoire mirrors the reference's sample export
(/root/reference/xml-data/records-440.xml — AUP with |c/|i subfields, ORCID
with |u, TIUE with "(DeepL) |s", GRANT with |i/|n, COPR with |c/|d/|e, ...).
All synthetic; no external data. A few HOT_* entries are deliberately placed
on ~20% of rows to create the hot-entity skew the north_rule requires the
engine to handle (salting / AQE skew join).
"""

FAMILY_NAMES = [
    "Müller", "Schmidt", "Schneider", "Fischer", "Weber", "Meyer", "Wagner",
    "Becker", "Schulz", "Hoffmann", "Koch", "Bauer", "Richter", "Klein",
    "Wolf", "Schröder", "Neumann", "Schwarz", "Zimmermann", "Braun",
    "Krüger", "Hofmann", "Hartmann", "Lange", "Schmitt", "Werner",
    "Schmitz", "Krause", "Meier", "Lehmann", "Smith", "Johnson", "Brown",
    "Taylor", "Wilson", "Davies", "Evans", "Thomas", "Roberts", "Walker",
    "Nowak", "Kowalski", "García", "Martínez", "Rossi", "Ferrari",
    "Jansen", "de Vries", "van den Berg", "Andersen", "Nielsen", "Larsen",
    "Dubois", "Moreau", "Laurent", "Tanaka", "Suzuki", "Watanabe",
    "Kim", "Lee", "Park", "Chen", "Wang", "Zhang", "Liu", "Singh",
    "Kumar", "Sharma", "Silva", "Santos", "Oliveira", "Haddad", "Öztürk",
    "Yılmaz", "Kaya", "Novák", "Svoboda", "Horváth", "Nagy", "Popescu",
]

GIVEN_NAMES = [
    "Anna", "Benedict", "Clara", "David", "Eva", "Felix", "Greta", "Hannah",
    "Ingrid", "Jonas", "Katharina", "Lukas", "Maria", "Niklas", "Olivia",
    "Paul", "Quentin", "Ralf", "Stefan", "Theresa", "Ulrich", "Vera",
    "Wolfgang", "Xenia", "Yifan", "Zoe", "Amr", "Björn", "Céline", "Dmitri",
    "Elena", "François", "Günther", "Hiroshi", "Isabel", "Jürgen", "Kai",
    "Lena", "Mateusz", "Nadia", "Oscar", "Priya", "Rosa", "Sören", "Tomás",
]

# Hot entities: placed on ~20% of records to create real key skew.
HOT_AUTHORS = [("Treue", "Stefan"), ("Margraf", "Jürgen"), ("Rief", "Winfried")]

AFFILIATIONS = [
    # (org name, country)
    ("Cognitive Neuroscience Laboratory, German Primate Center - Leibniz Institute for Primate Research, Göttingen", "GERMANY"),
    ("Department of Psychology, Ruhr University Bochum", "GERMANY"),
    ("Institute of Psychology, University of Vienna", "AUSTRIA"),
    ("Department of Psychiatry, University of Zurich", "SWITZERLAND"),
    ("Max Planck Institute for Human Development, Berlin", "GERMANY"),
    ("Leibniz Institute for Psychology (ZPID), Trier", "GERMANY"),
    ("Department of Clinical Psychology, Philipps University Marburg", "GERMANY"),
    ("Faculty of Psychology, University of Basel", "SWITZERLAND"),
    ("Department of Psychology, Humboldt University Berlin", "GERMANY"),
    ("School of Psychology, University of Nottingham", "UNITED KINGDOM"),
    ("Department of Psychology, Stanford University", "UNITED STATES"),
    ("Department of Psychological and Brain Sciences, Dartmouth College", "UNITED STATES"),
    ("Institute of Medical Psychology, LMU Munich", "GERMANY"),
    ("Department of Psychology, University of Amsterdam", "NETHERLANDS"),
    ("Center for Psychotherapy Research, Heidelberg University Hospital", "GERMANY"),
    ("Department of Developmental Psychology, University of Groningen", "NETHERLANDS"),
    ("Institut für Psychologie, Universität Innsbruck", "AUSTRIA"),
    ("Department of Psychology, Peking University", "PEOPLES REPUBLIC OF CHINA"),
    ("Graduate School of Education, Kyoto University", "JAPAN"),
    ("Department of Psychology, University of Toronto", "CANADA"),
]

HOT_AFFILIATIONS = [
    ("Department of Psychology, Ruhr University Bochum", "GERMANY"),
    ("Leibniz Institute for Psychology (ZPID), Trier", "GERMANY"),
]

JOURNALS = [
    # (title, issn, eissn)
    ("Scientific Data", "2052-4463", "2052-4463"),
    ("Zeitschrift für Klinische Psychologie und Psychotherapie", "1616-3443", "2190-6297"),
    ("Journal of Anxiety Disorders", "0887-6185", "1873-7897"),
    ("Frontiers in Psychology", "1664-1078", "1664-1078"),
    ("Psychologische Rundschau", "0033-3042", "2190-6238"),
    ("Diagnostica", "0012-1924", "2190-622X"),
    ("European Journal of Psychological Assessment", "1015-5759", "2151-2426"),
    ("Behaviour Research and Therapy", "0005-7967", "1873-622X"),
    ("Journal of Experimental Psychology: General", "0096-3445", "1939-2222"),
    ("Kindheit und Entwicklung", "0942-5403", "2190-6246"),
    ("Zeitschrift für Arbeits- und Organisationspsychologie", "0932-4089", "2190-6270"),
    ("Psychological Science", "0956-7976", "1467-9280"),
]
HOT_JOURNALS = ["Frontiers in Psychology", "Zeitschrift für Klinische Psychologie und Psychotherapie"]

PUBLISHERS = [
    ("Hogrefe", "Göttingen"),
    ("Springer", "Berlin"),
    ("Beltz", "Weinheim"),
    ("Kohlhammer", "Stuttgart"),
    ("Elsevier", "Amsterdam"),
    ("Routledge", "London"),
    ("Pabst Science Publishers", "Lengerich"),
]

FUNDERS = [
    # (grant field name, canonical, fundref doi suffix)
    ("Deutsche Forschungsgemeinschaft (DFG)", "Deutsche Forschungsgemeinschaft", "501100001659"),
    ("DFG", "Deutsche Forschungsgemeinschaft", "501100001659"),
    ("Bundesministerium für Bildung und Forschung", "Bundesministerium für Bildung und Forschung", "501100002347"),
    ("Schweizerischer Nationalfonds", "Schweizerischer Nationalfonds zur Förderung der Wissenschaftlichen Forschung", "501100001711"),
    ("FWF Austrian Science Fund", "Austrian Science Fund", "501100002428"),
    ("European Research Council", "European Research Council", "501100000781"),
    ("Volkswagen Foundation", "VolkswagenStiftung", "501100001663"),
    ("National Institutes of Health", "National Institutes of Health", "100000002"),
]

# J4 truncation-retry exercise: a funder whose grant-field name carries a
# comma tail; the org authority registers only the pre-comma prefix, so the
# FundRef link resolves solely through the reference's split-at-first-comma
# retry (convert_starxml_to_bf.py:871-877). Kept out of FUNDERS so the
# rng.choice draws (and thus the rest of the seeded corpus) are unchanged.
FUNDER_COMMA = ("Stiftung Deutsche Depressionshilfe, Leipzig", "501100023245")

TITLE_HEADS = [
    "Electrophysiological dataset from macaque visual cortical area MST",
    "Effects of cognitive behavioral therapy on anxiety symptoms",
    "Arbeitszufriedenheit und Führungsverhalten in deutschen Unternehmen",
    "A longitudinal study of reading development in primary school children",
    "Validierung einer deutschen Version des Self-Compassion Scale",
    "Neural correlates of working memory load",
    "Prävention von Depression im Jugendalter",
    "Attachment styles and romantic relationship satisfaction",
    "Messinvarianz des Big-Five-Inventars über Altersgruppen",
    "Emotion regulation strategies in daily life",
    "Der Einfluss von Achtsamkeit auf Stresserleben",
    "Predictors of treatment outcome in panic disorder",
    "Soziale Unterstützung und Burnout bei Pflegekräften",
    "Visual attention in natural scene perception",
    "Diagnostik von Lernstörungen im Grundschulalter",
    "Motivation and self-regulated learning in higher education",
]

TITLE_TAILS = [
    "in response to a novel motion stimulus",
    "a randomized controlled trial",
    "eine Längsschnittstudie",
    "evidence from eye tracking",
    "a meta-analysis",
    "Ergebnisse einer repräsentativen Befragung",
    "a preregistered replication",
    "an experience sampling study",
    "eine Pilotstudie",
    "a cross-cultural comparison",
]

ABSTRACT_SENTENCES_EN = [
    "Establishing the cortical neural representation of visual stimuli is a central challenge of systems neuroscience.",
    "We investigated the effects of a brief intervention on symptom severity.",
    "Participants completed a battery of standardized questionnaires at three measurement points.",
    "Results indicate a significant reduction in anxiety symptoms in the treatment group.",
    "The findings are discussed with respect to current models of emotion regulation.",
    "Data were analyzed using multilevel structural equation modeling.",
    "The sample consisted of 248 adults recruited from the general population.",
    "Implications for clinical practice and future research are outlined.",
    "Measurement invariance across age groups was supported.",
    "Open data and analysis scripts are available in a public repository.",
]

ABSTRACT_SENTENCES_DE = [
    "Die vorliegende Studie untersucht den Zusammenhang zwischen Achtsamkeit und Stresserleben.",
    "Die Stichprobe umfasste 312 Studierende einer deutschen Universität.",
    "Die Ergebnisse zeigen einen signifikanten Effekt der Intervention.",
    "Die Befunde werden vor dem Hintergrund aktueller Modelle diskutiert.",
    "Es wurden drei Messzeitpunkte über einen Zeitraum von zwölf Monaten realisiert.",
    "Implikationen für die klinische Praxis werden abgeleitet.",
]

CT_TERMS = [
    # (english, german) — controlled terms
    ("Neurons", "Neuronen"), ("Monkeys", "Affen"), ("Visual Cortex", "Visueller Kortex"),
    ("Anxiety Disorders", "Angststörungen"), ("Cognitive Behavior Therapy", "Kognitive Verhaltenstherapie"),
    ("Job Satisfaction", "Arbeitszufriedenheit"), ("Leadership", "Führung"),
    ("Reading Development", "Leseentwicklung"), ("Self-Compassion", "Selbstmitgefühl"),
    ("Working Memory", "Arbeitsgedächtnis"), ("Depression (Emotion)", "Depression"),
    ("Attachment Behavior", "Bindungsverhalten"), ("Emotion Regulation", "Emotionsregulation"),
    ("Mindfulness", "Achtsamkeit"), ("Panic Disorder", "Panikstörung"),
    ("Burnout", "Burnout"), ("Visual Attention", "Visuelle Aufmerksamkeit"),
    ("Learning Disorders", "Lernstörungen"), ("Academic Motivation", "Lernmotivation"),
    ("Test Validity", "Testvalidität"), ("Hypothesis Testing", "Hypothesenüberprüfung"),
    ("Open Data", "Offene Daten"), ("Animal Research", "Tierstudien"),
]

SH_CODES = ["2225", "3215", "3312", "3620", "2820", "2340", "3120", "2240"]

AGE_GROUPS = ["Adulthood", "Childhood", "Adolescence", "Preschool Age", "School Age", "Very Old", "Old"]

CM_CODES_VALID = ["10100", "10200", "10300", "10400", "20100", "10110", "10210"]

TEST_NAMES = [
    ("Beck Depression Inventory", "BDI-II", "9001"),
    ("State-Trait Anxiety Inventory", "STAI", "9002"),
    ("Self-Compassion Scale", "SCS", "9003"),
    ("Big Five Inventory", "BFI", "9004"),
    ("Maslach Burnout Inventory", "MBI", "9005"),
    ("NEO Five-Factor Inventory", "NEO-FFI", "9006"),
    ("Symptom Checklist 90 Revised", "SCL-90-R", "9007"),
    ("Wechsler Intelligence Scale for Children", "WISC-V", "9008"),
]

CONFERENCES = [
    ("52. Kongress der Deutschen Gesellschaft für Psychologie", "Hildesheim"),
    ("Annual Meeting of the Society for Neuroscience", "San Diego, CA"),
    ("European Conference on Visual Perception", "Nijmegen"),
    ("Tagung der Fachgruppe Klinische Psychologie und Psychotherapie", "Dresden"),
]

TRIAL_REGISTRIES = [
    # (template, registry label)
    ("NCT0{:07d}", "ClinicalTrials.gov"),
    ("DRKS000{:05d}", "DRKS"),
    ("ISRCTN{:08d}", "ISRCTN"),
    ("ACTRN126{:08d}", "ANZCTR"),
]

LICENSE_POOL = [
    "|c CC BY 4.0 |d Creative Commons Namensnennung |e Creative Commons Attribution",
    "|c CC BY-SA 4.0 |d Creative Commons Namensnennung - Weitergabe unter gleichen Bedingungen |e Creative Commons Attribution-ShareAlike",
    "|c CC BY-NC-ND 3.0 |d Creative Commons Namensnennung - Nicht kommerziell - Keine Bearbeitungen |e Creative Commons Attribution-NonCommercial-NoDerivs",
    "|c CC BY-NC 4.0 |d Creative Commons Namensnennung - Nicht kommerziell |e Creative Commons Attribution-NonCommercial",
    "|c AUTH |d Autor |e author",
    "|c PUBL |d Verlag |e publisher",
    "|c PDM |d Gemeinfrei |e public domain",
    "|c CC0 1.0 |d Gemeinfrei |e public domain",
]

DEGREES = ["Dr. phil.", "Dr. rer. nat.", "Dr. med.", "Ph.D.", "Dr. rer. medic."]

# Dirty-encoding decorations (STAR ^DD codes + HTML entities) injected into a
# fraction of text fields; the cleaner (F1/F2) must normalize these.
# (raw, cleaned) — raw values are genuine keys of data.tables.dd_codes or
# HTML entities that html.unescape resolves.
DIRTY_DECORATIONS = [
    ("^D*a", "α"),
    ("^D*b", "β"),
    ("&amp;", "&"),
    ("&ouml;", "ö"),
    ("&uuml;", "ü"),
    ('^D<,', '"'),
    ("^DDS", "–"),
    ('a^D"&', "ä"),
]
