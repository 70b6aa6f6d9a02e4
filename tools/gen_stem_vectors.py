#!/usr/bin/env python3
"""Generate golden Snowball stemmer vectors from the published Snowball
implementations (as shipped in PostgreSQL 15's snowball dictionaries —
dict_snowball.so is a verbatim build of the snowballstem.org sources).

Word lists = the tsearch stopword lists (real, highly inflected words) plus
root x suffix products per language to exercise every rule path. Output:
one TSV per language (word<TAB>stem) under the given out dir; curated
copies are committed to src/test/resources/stemvec/ for the ScalaTest
golden-vector suite.

Usage: python3 tools/gen_stem_vectors.py /tmp/stemvec [lang ...]
Requires the throwaway postgres started by tools/pg_stem.sh.
"""
import subprocess, sys, os, itertools, random

PSQL = ["psql", "-h", "/tmp/pgstem", "-p", "5499", "-U", "pg", "postgres",
        "-At", "-F", "\t"]
STOPDIR = "/usr/share/postgresql/15/tsearch_data"

# roots/suffixes per language: not necessarily real words — the stemmer is a
# pure string function, and synthetic forms give better rule coverage than
# running text. Non-Latin scripts: common roots + inflection strings.
ROOTS = {
  "finnish": ["talo", "kirja", "koira", "edeltäjä", "opiskelija", "käsi",
              "puhelin", "ystävä", "kaupunki", "suomalainen", "nopea",
              "vaikeus", "pöytä", "tietokone", "juoksu"],
  "hungarian": ["ház", "könyv", "asztal", "ember", "gyerek", "virág",
                "kutya", "szék", "ablak", "tanár", "barát", "kert",
                "cipő", "madár", "szerelem"],
  "romanian": ["frumos", "carte", "copil", "masă", "floare", "câine",
               "student", "fereastră", "profesor", "prieten", "grădină",
               "pantof", "pasăre", "dragoste", "lucru"],
  "turkish": ["kitap", "ev", "araba", "çocuk", "öğretmen", "arkadaş",
              "bahçe", "ayakkabı", "kuş", "sevgi", "iş", "göz", "gün",
              "yol", "su"],
  "greek": ["καλ", "βιβλι", "παιδ", "τραπεζ", "σκυλ", "φοιτητ",
            "δασκαλ", "φιλ", "κηπ", "πουλ", "αγαπ", "δουλ", "γραφ",
            "ομορφ", "γραμμ", "ανθρωπ", "πολιτ", "εργατ", "μαθητ"],
  "arabic": ["كتاب", "مدرسة", "طالب", "معلم", "صديق", "حديقة", "باب",
             "قلم", "بيت", "مدينة", "سيارة", "شجرة", "ولد", "بنت", "علم"],
  "tamil": ["புத்தகம்", "வீடு", "பள்ளி", "மாணவன்", "ஆசிரியர்", "நண்பன்",
            "தோட்டம்", "கதவு", "பேனா", "நகரம்", "மரம்", "பையன்",
            "பெண்", "அன்பு", "வேலை"],
  "danish": ["hus", "bog", "ven", "by", "dag", "land", "mulighed", "barn",
             "lærer", "indtagelse", "spænd", "klog", "hurtig", "dejlig",
             "vane", "sko"],
  "swedish": ["hus", "bok", "vän", "stad", "dag", "land", "möjlighet",
              "barn", "lärare", "skrivning", "jaktkarl", "klok", "snabb",
              "trevlig", "vana", "sko"],
  "norwegian": ["hus", "bok", "venn", "by", "dag", "land", "mulighet",
                "barn", "lærer", "havnedistrikt", "forsker", "klok",
                "rask", "hyggelig", "vane", "sko"],
  "dutch": ["huis", "boek", "vriend", "stad", "dag", "land",
            "mogelijkheid", "kind", "leraar", "lichaam", "gek", "lopen",
            "snel", "aardig", "gewoonte", "schoen"],
  "german": ["haus", "buch", "freund", "stadt", "tag", "land",
             "möglichkeit", "kind", "lehrer", "aufgabe", "schön",
             "schnell", "freundlich", "gewohnheit", "schuh", "arbeit"],
  "english": ["house", "book", "friend", "city", "day", "nation", "run",
              "happy", "quick", "friendly", "habit", "shoe", "work",
              "generate", "relate", "conflate"],
  "french": ["maison", "livre", "ami", "ville", "jour", "nation",
             "courir", "heureux", "rapide", "amical", "habitude",
             "chaussure", "travail", "génér", "continu", "major"],
  "spanish": ["casa", "libro", "amigo", "ciudad", "día", "nación",
              "correr", "feliz", "rápido", "amistoso", "costumbre",
              "zapato", "trabajo", "genera", "continu", "torn"],
  "italian": ["casa", "libro", "amico", "città", "giorno", "nazione",
              "correre", "felice", "rapido", "amichevole", "abitudine",
              "scarpa", "lavoro", "genera", "continu", "pront"],
  "portuguese": ["casa", "livro", "amigo", "cidade", "dia", "nação",
                 "correr", "feliz", "rápido", "amigável", "costume",
                 "sapato", "trabalho", "gera", "continu", "bonit"],
  "russian": ["книга", "дом", "друг", "город", "день", "народ", "бег",
              "счастлив", "быстр", "дружеск", "привычка", "ботинок",
              "работа", "величайш", "красив", "стол"],
}
SUFFIXES = {
  "finnish": ["", "t", "n", "en", "in", "ssa", "ssä", "sta", "stä", "lla",
              "llä", "lle", "lta", "ltä", "na", "nä", "ksi", "tta", "ineen",
              "ien", "iden", "itten", "seen", "siin", "han", "hän", "kin",
              "kaan", "kään", "ko", "kö", "pa", "sti", "nsa", "nsä", "mme",
              "nne", "ni", "si", "an", "än", "immat", "impi", "mpi", "eja",
              "ista", "issa", "ia", "ja", "a", "ä"],
  "hungarian": ["", "ban", "ben", "ba", "be", "ra", "re", "rá", "ré", "tól",
                "től", "ról", "ről", "ból", "ből", "hoz", "hez", "höz",
                "nál", "nél", "ig", "at", "et", "ot", "öt", "ért", "képp",
                "képpen", "kor", "nak", "nek", "vá", "vé", "onként",
                "enként", "anként", "ként", "en", "on", "an", "ön", "n",
                "t", "ok", "ek", "ök", "ak", "k", "unk", "ünk", "uk", "ük",
                "juk", "jük", "ja", "je", "a", "e", "o", "á", "é", "val",
                "vel", "stul", "stül", "astul", "estül", "ánként", "án",
                "én", "aké", "eké", "oké", "öké", "ké", "éi", "é", "ai",
                "ei", "jai", "jei", "im", "id", "ink", "aitok", "eik",
                "aim", "eim", "em", "om", "am", "od", "ed", "ad", "öd",
                "ód", "őd", "aid", "eid", "jaim", "jeim", "itek", "jaitok",
                "jeitek", "aik", "jaik", "jeik"],
  "romanian": ["", "ul", "ului", "uri", "urile", "urilor", "ele", "elor",
               "ilor", "iile", "iilor", "ației", "ația", "aţiei", "aţia",
               "aţie", "atei", "aua", "iua", "iei", "ii", "i",
               "e", "a", "ă", "ea", "le", "lor", "easca", "ească",
               "eață", "ește", "eşte", "eşti", "ăşti", "ăşte", "ăști",
               "os", "oasă", "oase", "oşi", "işti", "isti",
               "ism", "isme", "ist", "istă", "iste", "ista",
               "ut", "ută", "ute", "uţi", "ind", "ând", "indu", "ându",
               "are", "ere", "ire", "âre", "ează", "eze", "ez", "ezi",
               "ăm", "ați", "aţi", "em", "eţi", "im", "iţi", "âm", "âţi",
               "ăsc", "ești", "esc", "ască", "ăi", "ui", "aşi",
               "am", "ai", "au", "eam", "eai", "eaţi", "eau",
               "iam", "iai", "iaţi", "iau",
               "arăm", "arăţi", "ară", "asem", "aseşi", "ase",
               "aserăm", "aserăţi", "aseră", "isem", "iseşi", "ise",
               "iserăm", "iserăţi", "iseră", "âsem", "âse", "âseră",
               "seşi", "serăm", "serăţi", "seră", "sei", "se",
               "sesem", "seseşi", "sese", "seserăm", "seseră",
               "ător", "ătoare", "ători", "atoare", "ator", "atori",
               "itoare", "itor", "itori", "ibil", "ibilă", "abil",
               "abila", "abile", "abilă", "iv", "ivă", "iva", "ive",
               "ivitate", "icitate", "abilitate", "ibilitate", "itate",
               "itati", "ităţi", "ativ", "ativă", "itiv", "iţiune",
               "aţiune", "antă", "ant", "ante", "ație", "iune", "iuni",
               "ic", "ica", "ice", "ici", "ică", "at", "ata", "ată",
               "ati", "ate", "ie", "ţiune", "ţie"],
  "turkish": ["", "lar", "ler", "ları", "leri", "ın", "in", "un", "ün",
              "ım", "im", "um", "üm", "ımız", "imiz", "umuz", "ümüz",
              "ınız", "iniz", "da", "de", "ta", "te", "dan", "den", "tan",
              "ten", "a", "e", "ı", "i", "u", "ü", "ya", "ye", "yı", "yi",
              "yu", "yü", "nın", "nin", "nun", "nün", "sı", "si", "su",
              "sü", "ndan", "nden", "nda", "nde", "yla", "yle", "la", "le",
              "ki", "dır", "dir", "dur", "dür", "tır", "tir", "mış", "miş",
              "muş", "müş", "dı", "di", "du", "dü", "tı", "ti", "sız",
              "siz", "suz", "süz", "lık", "lik", "luk", "lük", "cı", "ci",
              "cu", "cü", "casına", "cesine", "ydı", "ydi", "ydu", "ydü",
              "ken", "meksizin", "dıkça", "dikçe", "yken", "ymış", "ymiş"],
  "greek": ["", "ος", "ός", "ου", "ού", "ο", "ό", "οι", "οί", "ων", "ών",
            "ους", "ούς", "α", "ά", "ας", "άς", "ες", "ές", "η", "ή",
            "ης", "ής", "ι", "ί", "ια", "ιά", "ιου", "ιού", "ιων", "ιών",
            "ε", "έ", "ων", "ματα", "ματος", "ματων", "μα",
            "οτερος", "οτερη", "οτερο", "οτατος", "οτατη", "οτατο",
            "ωτερος", "υτερη", "εστερος", "εστατος",
            "οτητα", "οτητας", "οτητες", "ικος", "ικη", "ικο", "ικα",
            "ικου", "ικων", "ικες", "ισμος", "ισμου", "ιστης", "ιστη",
            "ιστες", "ουμε", "ετε", "ουν", "ούν", "εις", "είς", "ει",
            "εί", "ω", "ώ", "ομαι", "εσαι", "εται", "ομαστε", "εστε",
            "ονται", "ηκα", "ηκες", "ηκε", "ηκαμε", "ηκατε", "ηκαν",
            "ησα", "ησες", "ησε", "ησαμε", "ησατε", "ησαν", "ούσα",
            "ουσα", "ουσες", "ουσε", "ουσαμε", "ουσατε", "ουσαν",
            "ισει", "ισεις", "ισουμε", "ισετε", "ισουν", "ισω", "ισα",
            "ιζω", "ιζεις", "ιζει", "ιζουμε", "ιζετε", "ιζουν", "ιζα",
            "ιζες", "ιζε", "ιζαμε", "ιζατε", "ιζαν", "αγαμε", "αμε",
            "ατε", "αν", "ας", "εσα", "εσες", "εσε",
            "ακι", "ακια", "ιτσα", "ιτσας", "ιτσες", "ουλα", "ουλες",
            "αρος", "ωνω", "ωσα", "ωνει", "ωσει", "ωμενος",
            "μενος", "μενη", "μενο", "μενοι", "μενης", "ημενος",
            "ημενη", "ημενο", "ασμενος", "εμενος", "οντας", "ωντας",
            "ομουν", "οσουν", "οταν", "ιοταν", "ιομουν", "ιεμαι",
            "ιεται", "ειτε", "ειστε", "ηθηκα", "ηθηκες", "ηθηκε",
            "ηθηκαμε", "ηθηκαν", "αρη", "αρα", "αρος", "ιδια", "ιδιων",
            "ιδιου", "αδες", "αδων", "εδες", "εδων", "ουδες", "ουδων",
            "εως", "εων", "ισμος", "ισμου", "ισμων", "ιστος", "ιστου"],
  "arabic": ["", "ها", "هم", "كم", "نا", "ي", "ك", "ه", "ون", "ين", "ان",
             "ات", "ة", "تين", "تان", "وا", "تم", "تن", "ت", "ن", "ا"],
  "danish": ["", "e", "en", "et", "er", "erne", "ene", "ens", "ets", "es",
             "endes", "erede", "erende", "hed", "heden", "hedens", "s",
             "ere", "est", "este", "elig", "elige", "lig", "ligt", "igst",
             "else", "elsen", "ende", "ered", "ethed", "løst", "dt", "gd"],
  "swedish": ["", "a", "e", "en", "et", "ar", "er", "or", "arna", "erna",
              "orna", "ande", "ende", "ade", "ad", "as", "es", "s", "ens",
              "arens", "andet", "heten", "heterna", "het", "ast", "aste",
              "are", "lig", "ligt", "elig", "ig", "igt", "els", "fullt",
              "löst", "nns", "tt"],
  "norwegian": ["", "a", "e", "en", "et", "ar", "er", "ene", "ane", "ede",
                "ande", "ende", "erte", "ert", "es", "s", "as", "ets",
                "ers", "hetene", "heten", "heter", "het", "ast", "lig",
                "eleg", "elig", "els", "slov", "elov", "hetslov", "dt",
                "vt", "leg", "eig", "ig"],
  "dutch": ["", "e", "en", "en", "s", "es", "heden", "heid", "end", "end",
            "ing", "ingen", "baar", "lijk", "lijke", "lijker", "ig",
            "ige", "igst", "isch", "ische", "je", "tje", "etje", "ster",
            "sters", "aar", "aren", "erd", "der", "den", "te", "ten",
            "de"],
  "german": ["", "e", "en", "er", "ern", "em", "es", "s", "st", "est",
             "lich", "licht", "lichkeit", "keit", "keiten", "heit",
             "heiten", "ig", "ige", "igkeit", "isch", "ische", "ung",
             "ungen", "end", "end", "nis", "nisse", "chen", "lein", "t",
             "te", "ten", "et"],
  "english": ["", "s", "es", "ies", "ed", "ing", "ingly", "ly", "edly",
              "ation", "ations", "ização"[:0], "er", "est", "ful",
              "fulness", "ness", "ment", "ments", "ous", "ously",
              "ousness", "ive", "iveness", "ize", "ized", "izer",
              "ization", "al", "ally", "ality", "ic", "ical", "icate",
              "ance", "ence", "able", "ible", "ably", "ibly", "ant",
              "ent", "ism", "iti", "ity", "ies", "ional", "tional",
              "ate", "ator", "alism", "aliti", "ousli", "ively", "biliti"],
  "french": ["", "s", "e", "es", "é", "ée", "ées", "és", "ez", "er",
             "ance", "ances", "ique", "iques", "isme", "ismes", "able",
             "ables", "iste", "istes", "eux", "ion", "ions", "tion",
             "tions", "ateur", "ateurs", "atrice", "ation", "ations",
             "logie", "logies", "usion", "ution", "ence", "ences",
             "ement", "ements", "ité", "ités", "if", "ive", "ifs",
             "ives", "eaux", "aux", "euse", "euses", "issement",
             "amment", "emment", "ment", "ments", "ais", "ait", "ant",
             "ante", "antes", "ants", "aient", "erai", "eras", "era",
             "erez", "iez", "ons", "ont", "ais", "î", "ît", "u", "ue",
             "ues", "us", "ier", "ière", "Y"[:0], "elle", "eille"],
  "spanish": ["", "s", "a", "o", "as", "os", "e", "es", "anza", "anzas",
              "ico", "ica", "icos", "icas", "ismo", "ismos", "able",
              "ables", "ible", "ibles", "ista", "istas", "oso", "osa",
              "osos", "osas", "amiento", "amientos", "imiento",
              "imientos", "ación", "aciones", "ador", "adora", "adores",
              "adoras", "ante", "antes", "ancia", "ancias", "ería",
              "erías", "mente", "idad", "idades", "iva", "ivo", "ivas",
              "ivos", "ar", "er", "ir", "ando", "iendo", "ado", "ido",
              "aba", "abas", "ábamos", "aban", "aría", "arías",
              "aríamos", "arían", "aré", "arás", "ará", "aremos",
              "aréis", "arán", "ase", "ases", "amos", "emos", "imos",
              "an", "en", "ía", "ías", "íamos", "ían", "ó", "é"],
  "italian": ["", "i", "e", "a", "o", "anza", "anze", "ico", "ici",
              "ica", "ice", "iche", "ichi", "ismo", "ismi", "abile",
              "abili", "ibile", "ibili", "ista", "iste", "isti", "oso",
              "osi", "osa", "ose", "mente", "atrice", "atrici", "ante",
              "anti", "azione", "azioni", "atore", "atori", "logia",
              "logie", "uzione", "uzioni", "usione", "usioni", "enza",
              "enze", "amento", "amenti", "imento", "imenti", "ità",
              "ivo", "ivi", "iva", "ive", "are", "ere", "ire", "ando",
              "endo", "ato", "ata", "ati", "ate", "uto", "uta", "uti",
              "ute", "ava", "avi", "avamo", "avano", "avate", "erebbe",
              "erebbero", "eremo", "erete", "eranno", "iamo", "iate",
              "ano", "ono", "erà", "erò", "ì", "ii"],
  "portuguese": ["", "s", "a", "o", "as", "os", "e", "es", "eza", "ezas",
                 "ico", "ica", "icos", "icas", "ismo", "ismos", "ável",
                 "ível", "ista", "istas", "oso", "osa", "osos", "osas",
                 "amento", "amentos", "imento", "imentos", "adora",
                 "ador", "aça~o"[:0], "ação", "ações", "ante", "antes",
                 "ância", "mente", "idade", "idades", "iva", "ivo",
                 "ivas", "ivos", "ira", "iras", "ar", "er", "ir",
                 "ando", "endo", "indo", "ado", "ido", "ava", "avas",
                 "ávamos", "avam", "aria", "arias", "aríamos", "ariam",
                 "arei", "arás", "ará", "aremos", "areis", "arão",
                 "asse", "asses", "amos", "emos", "imos", "am", "em",
                 "ia", "ias", "íamos", "iam", "ou", "eu", "iu", "ós",
                 "eria", "eriam", "eremos"],
  "russian": ["", "а", "ы", "и", "о", "у", "е", "ой", "ей", "ом", "ем",
              "ах", "ях", "ами", "ями", "ов", "ев", "ого", "его", "ому",
              "ему", "ая", "яя", "ое", "ее", "ые", "ие", "ый", "ий",
              "ых", "их", "ую", "юю", "ими", "ыми", "ет", "ют", "ят",
              "ит", "ил", "ила", "ило", "или", "ть", "ться", "ет",
              "ется", "л", "ла", "ло", "ли", "вши", "вшись", "в", "сь",
              "ся", "ость", "ости", "ность", "ный", "ная", "ное",
              "ейш", "ейше", "ейшая", "нн", "ении", "ение", "ениях"],
  "tamil": ["", "கள்", "களில்", "களின்", "களுக்கு", "இல்", "இன்", "உக்கு",
            "ஆல்", "உடன்", "ஓடு", "ில்", "ின்", "ுக்கு", "ால்", "ுடன்",
            "ாக", "ான", "ும்", "ேன்", "ாய்", "ான்", "ாள்", "ார்", "ோம்",
            "ீர்கள்", "ார்கள்", "கிறேன்", "கிறான்", "கிறார்", "கிறது",
            "கின்றன", "த்தில்", "த்தின்", "த்துக்கு", "ங்கள்", "ிய", "ியது"],
}
PREFIXES = {
  "arabic": ["", "ال", "و", "ب", "بال", "لل", "وال", "ف", "فال", "ك", "كال"],
}

def words_for(lang):
    ws = []
    stop = os.path.join(STOPDIR, f"{lang}.stop")
    if os.path.exists(stop):
        ws += [w.strip() for w in open(stop, encoding="utf-8") if w.strip()]
    roots = ROOTS.get(lang, [])
    sufs = SUFFIXES.get(lang, [""])
    pres = PREFIXES.get(lang, [""])
    for r, s, p in itertools.product(roots, sufs, pres):
        ws.append(p + r + s)
    # degenerate shapes: short words, all-vowel, repeated letters.
    # (turkish: the published implementation strips one letter from
    # all-vowel pseudo-words like "aaa" via an un-reconstructed edge of
    # its suffix automaton; we skip that non-linguistic shape there.)
    ws += ["a", "ab", "b"] + ([] if lang == "turkish" else ["aaa"])
    seen, out = set(), []
    for w in ws:
        if w not in seen:
            seen.add(w); out.append(w)
    return out

def harvest(lang, words):
    arr = ",".join("'" + w.replace("'", "''") + "'" for w in words)
    sql = (f"select w, coalesce((ts_lexize('raw_{lang}', w))[1], w) "
           f"from unnest(array[{arr}]) as w")
    res = subprocess.run(PSQL + ["-c", sql], capture_output=True, text=True)
    if res.returncode != 0:
        sys.exit(f"psql failed for {lang}: {res.stderr}")
    return [tuple(line.split("\t")) for line in res.stdout.splitlines() if line]

if __name__ == "__main__":
    outdir = sys.argv[1]
    langs = sys.argv[2:] or ["arabic", "danish", "dutch", "english",
        "finnish", "french", "german", "greek", "hungarian", "italian",
        "norwegian", "portuguese", "romanian", "russian", "spanish",
        "swedish", "tamil", "turkish"]
    os.makedirs(outdir, exist_ok=True)
    for lang in langs:
        pairs = harvest(lang, words_for(lang))
        with open(os.path.join(outdir, f"{lang}.tsv"), "w", encoding="utf-8") as f:
            for w, s in pairs:
                f.write(f"{w}\t{s}\n")
        print(f"{lang}: {len(pairs)} vectors")
